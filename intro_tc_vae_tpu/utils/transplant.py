"""Import PyTorch reference checkpoints into this framework.

Maps a torch ``state_dict`` from the reference SoftIntroVAE
(models.py:301-355; checkpoint format utils.py:26-36: {'epoch', 'model'})
onto our flax params/batch_stats trees, handling:

* conv kernels OIHW -> HWIO,
* dense kernels [out, in] -> [in, out],
* the encoder-fc input / decoder-fc output feature permutation caused by
  NCHW-flatten (torch, models.py:241/296) vs NHWC-flatten (ours),
* BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.

This both migrates real reference checkpoints and powers the numerical
parity tests (same weights -> same outputs).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _nchw_to_nhwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """perm[j] = torch flat index for our flat index j (HWC order)."""
    idx_t = np.arange(c * h * w).reshape(c, h, w)     # torch CHW layout
    return np.transpose(idx_t, (1, 2, 0)).reshape(-1)  # ours HWC order


def _block_param_names(arch: str):
    if arch in ("conv", "res"):
        return {
            "conv1": "conv1", "bn1": "bn1", "conv2": "conv2", "bn2": "bn2",
            "conv_expand": "conv_expand",
        }
    # inception: our flattened branch names
    return {
        "branch_0.conv": "branch_0.conv",
        "branch_0.batch_norm": "branch_0.batch_norm",
        "branch_1.0.conv": "branch_1_0.conv",
        "branch_1.0.batch_norm": "branch_1_0.batch_norm",
        "branch_1.1.conv": "branch_1_1.conv",
        "branch_1.1.batch_norm": "branch_1_1.batch_norm",
        "conv": "conv",
        "conv_expand": "conv_expand",
    }


def _put(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def torch_state_dict_to_flax(
    state_dict: Dict[str, "np.ndarray"],
    arch: str,
    conv_output_size: Tuple[int, int, int],
) -> Tuple[dict, dict]:
    """torch state_dict (tensor or ndarray values) -> (params, batch_stats).

    conv_output_size: our NHWC (h, w, c) encoder conv output shape.
    """
    sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params: dict = {"encoder": {}, "decoder": {}}
    stats: dict = {"encoder": {}, "decoder": {}}
    h, w, c = conv_output_size
    enc_fc_perm = _nchw_to_nhwc_perm(c, h, w)

    def put_bn(side: str, our: str, torch_prefix: str):
        _put(params[side], f"{our}/scale", sd[f"{torch_prefix}.weight"])
        _put(params[side], f"{our}/bias", sd[f"{torch_prefix}.bias"])
        _put(stats[side], f"{our}/mean", sd[f"{torch_prefix}.running_mean"])
        _put(stats[side], f"{our}/var", sd[f"{torch_prefix}.running_var"])

    def put_conv(side: str, our: str, torch_prefix: str):
        _put(params[side], f"{our}/kernel", _conv(sd[f"{torch_prefix}.weight"]))
        if f"{torch_prefix}.bias" in sd:
            _put(params[side], f"{our}/bias", sd[f"{torch_prefix}.bias"])

    names = _block_param_names(arch)

    def put_block(side: str, our_block: str, torch_block: str):
        for t_name, our_name in names.items():
            t_key = f"{torch_block}.{t_name}"
            if f"{t_key}.weight" not in sd:
                continue  # conv_expand may not exist
            if "bn" in t_name or "batch_norm" in t_name:
                put_bn(side, f"{our_block}/{our_name.replace('.', '/')}", t_key)
            else:
                # skip the dead conv_expand of ConvolutionalBlock (never
                # used in its forward, reference models.py:15-26,51-54)
                if arch == "conv" and t_name == "conv_expand":
                    continue
                put_conv(side, f"{our_block}/{our_name.replace('.', '/')}", t_key)

    # ---- encoder ----
    put_conv("encoder", "stem_conv", "encoder.main.0")
    put_bn("encoder", "stem_bn", "encoder.main.1")
    block_names = sorted(
        {k.split(".")[2] for k in sd if k.startswith("encoder.main.res_in_")}
    )
    for b in block_names:
        put_block("encoder", b, f"encoder.main.{b}")
    fc_w = sd["encoder.fc.weight"]  # [2z, F_torch]
    _put(params["encoder"], "fc/kernel", fc_w.T[enc_fc_perm, :])
    _put(params["encoder"], "fc/bias", sd["encoder.fc.bias"])

    # ---- decoder ----
    dec_fc_w = sd["decoder.fc.0.weight"]  # [F_torch, z]
    _put(params["decoder"], "fc/kernel", dec_fc_w.T[:, enc_fc_perm])
    _put(params["decoder"], "fc/bias", sd["decoder.fc.0.bias"][enc_fc_perm])
    dec_blocks = sorted(
        {k.split(".")[2] for k in sd if k.startswith("decoder.main.res_in_")}
    )
    for b in dec_blocks:
        put_block("decoder", b, f"decoder.main.{b}")
    put_conv("decoder", "predict", "decoder.main.predict")

    return params, stats


def load_torch_checkpoint(path: str, arch: str, conv_output_size):
    """Load a reference .pth checkpoint file -> (params, batch_stats)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["model"] if isinstance(payload, dict) and "model" in payload else payload
    return torch_state_dict_to_flax(sd, arch, conv_output_size)
