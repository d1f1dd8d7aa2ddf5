"""CLI entry: ``python -m intro_tc_vae_tpu.main -f config.json -u '{...}'``.

Same contract as reference main.py:7-23 (-f/--config JSON path,
-u/--update inline-JSON override dict).
"""

from __future__ import annotations

import argparse
import json

from intro_tc_vae_tpu.config import load_config
from intro_tc_vae_tpu.train import train_soft_intro_vae


def cli(argv=None):
    parser = argparse.ArgumentParser(description="train Soft-Intro-TC-VAE (TPU)")
    parser.add_argument("-f", "--config", type=str, default=None,
                        help="Path to the JSON config file")
    parser.add_argument("-u", "--update", type=json.loads, default="{}",
                        help="Inline JSON dict overriding config values")
    args = parser.parse_args(argv)
    config = load_config(args.config, update_dict=args.update)
    train_soft_intro_vae(config=config)


if __name__ == "__main__":
    cli()
