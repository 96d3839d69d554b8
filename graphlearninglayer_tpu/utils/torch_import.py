"""Torch ``.pth`` checkpoint import (reference-interop).

The reference's flagship recipe STARTS from a shipped torch checkpoint
(``resnet18_SimCLR_mlp.pth`` — /root/reference/README.md:31-32,54) loaded
tolerantly into ``buildnet`` (``.module`` prefix strip + ``strict=False``
partial load, /root/reference/utils.py:505-553).  This module lets a user
of the reference bring that exact file here: it converts a torch
``state_dict`` into this package's flax ``BuildNet`` params/batch_stats.

Layout translation (torch -> flax):

  * ``encoder.conv1/bn1``            -> ``<Encoder>_0/Conv_0 / BatchNorm_0``
  * ``encoder.layerL.B.convJ/bnJ``   -> ``<Encoder>_0/<Block>_{i}/Conv_{J-1}
                                         / BatchNorm_{J-1}`` where ``i``
    counts blocks sequentially across stages (flax @nn.compact order);
  * ``...shortcut.0 / shortcut.1``   -> the block's LAST ``Conv_n`` /
                                        ``BatchNorm_n`` (n = #convs in the
    main branch: 2 for BasicBlock, 3 for Bottleneck);
  * ``head.{0,2} | head``            -> ``head_0 / head_1`` (mlp | linear);
  * ``linear.{0,2}``                 -> ``linear_0 / linear_1`` (aux MLP
    classifier, networks/BuildNet.py:86-89);
  * conv weights OIHW -> HWIO, dense weights (out,in) -> (in,out);
  * BN ``weight/bias`` -> params ``scale/bias``; ``running_mean/var`` ->
    batch_stats ``mean/var``; ``num_batches_tracked`` is dropped (flax
    uses fixed momentum, as does the reference's BatchNorm2d default).

Unmatched torch keys and untouched flax leaves are reported exactly like
the reference's strict=False load ("Missing keys:" / "Unexpected keys:").
"""
from __future__ import annotations

import re

import numpy as np

__all__ = ["convert_torch_state_dict", "restore_torch_checkpoint"]


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


_BN_PART = {"weight": ("params", "scale"), "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var")}


def _translate(sd_keys, encoder_name, block_name):
    """Return {torch_key: (collection, flax_path, transform)} for every
    translatable torch key.  ``transform`` is 'conv' / 'dense' / None."""
    # per-stage block counts, from the torch keys themselves
    stage_blocks: dict[int, int] = {}
    for k in sd_keys:
        m = re.match(r"encoder\.layer(\d+)\.(\d+)\.", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            stage_blocks[s] = max(stage_blocks.get(s, -1), b)
    stage_base = {}
    acc = 0
    for s in sorted(stage_blocks):
        stage_base[s] = acc
        acc += stage_blocks[s] + 1
    # convs per main branch within a block (2 = BasicBlock, 3 = Bottleneck)
    nconv = 0
    for k in sd_keys:
        m = re.match(r"encoder\.layer\d+\.\d+\.conv(\d+)\.weight", k)
        if m:
            nconv = max(nconv, int(m.group(1)))

    table = {}
    for k in sd_keys:
        rest = None
        if k.startswith("encoder."):
            ek = k[len("encoder."):]
            if ek == "conv1.weight":
                rest = ("params", (encoder_name, "Conv_0", "kernel"), "conv")
            elif (m := re.match(r"bn1\.(\w+)$", ek)):
                if m.group(1) in _BN_PART:
                    col, leaf = _BN_PART[m.group(1)]
                    rest = (col, (encoder_name, "BatchNorm_0", leaf), None)
            elif (m := re.match(r"layer(\d+)\.(\d+)\.(.+)$", ek)):
                s, b, sub = int(m.group(1)), int(m.group(2)), m.group(3)
                blk = f"{block_name}_{stage_base[s] + b}"
                if (mm := re.match(r"conv(\d+)\.weight$", sub)):
                    rest = ("params",
                            (encoder_name, blk,
                             f"Conv_{int(mm.group(1)) - 1}", "kernel"),
                            "conv")
                elif (mm := re.match(r"bn(\d+)\.(\w+)$", sub)):
                    if mm.group(2) in _BN_PART:
                        col, leaf = _BN_PART[mm.group(2)]
                        rest = (col,
                                (encoder_name, blk,
                                 f"BatchNorm_{int(mm.group(1)) - 1}", leaf),
                                None)
                elif sub == "shortcut.0.weight":
                    rest = ("params",
                            (encoder_name, blk, f"Conv_{nconv}", "kernel"),
                            "conv")
                elif (mm := re.match(r"shortcut\.1\.(\w+)$", sub)):
                    if mm.group(1) in _BN_PART:
                        col, leaf = _BN_PART[mm.group(1)]
                        rest = (col,
                                (encoder_name, blk,
                                 f"BatchNorm_{nconv}", leaf),
                                None)
        elif (m := re.match(r"head\.(weight|bias)$", k)):           # linear
            rest = ("params", ("head_0", {"weight": "kernel",
                                          "bias": "bias"}[m.group(1)]),
                    "dense" if m.group(1) == "weight" else None)
        elif (m := re.match(r"(head|linear)\.([02])\.(weight|bias)$", k)):
            name = f"{m.group(1)}_{int(m.group(2)) // 2}"
            leaf = {"weight": "kernel", "bias": "bias"}[m.group(3)]
            rest = ("params", (name, leaf),
                    "dense" if m.group(3) == "weight" else None)
        if rest is not None:
            table[k] = rest
    return table


def convert_torch_state_dict(state_dict: dict, params: dict,
                             batch_stats: dict, verbose: bool = True):
    """Tolerantly merge a torch ``state_dict`` into flax ``(params,
    batch_stats)`` templates; returns ``(params, batch_stats, report)``.

    ``report`` = {'loaded': [...], 'missing': [...], 'unexpected': [...]}
    where missing/unexpected follow torch's ``load_state_dict(strict=False)``
    meaning (missing = template leaves not provided, unexpected = torch
    keys with no destination or a shape mismatch).
    """
    # `.module` strip, as the reference does for DataParallel checkpoints
    # (utils.py:531-533)
    sd = {}
    for k, v in state_dict.items():
        sd[k.replace(".module", "").removeprefix("module.")] = (
            v.detach().cpu().numpy() if hasattr(v, "detach")
            else np.asarray(v))

    flat_p = _flatten(params)
    flat_b = _flatten(batch_stats) if batch_stats else {}
    encoder_name = next((p[0] for p in flat_p
                         if p[0] not in ("head_0", "head_1",
                                         "linear_0", "linear_1")), None)
    block_name = "Bottleneck" if any(
        len(p) > 1 and p[1].startswith("Bottleneck") for p in flat_p) \
        else "BasicBlock"

    table = _translate(sd.keys(), encoder_name, block_name)
    loaded, unexpected = [], []
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue                       # no flax counterpart by design
        if k not in table:
            unexpected.append(k)
            continue
        col, path, tf = table[k]
        dest = flat_p if col == "params" else flat_b
        if tf == "conv":
            v = np.transpose(v, (2, 3, 1, 0))        # OIHW -> HWIO
        elif tf == "dense":
            v = np.transpose(v, (1, 0))              # (out,in) -> (in,out)
        if path not in dest or dest[path].shape != v.shape:
            unexpected.append(k)
            continue
        dest[path] = v.astype(np.asarray(dest[path]).dtype)
        loaded.append(k)

    touched = {table[k][1] for k in loaded}
    missing = [("/".join(p)) for p in (*flat_p, *flat_b)
               if p not in touched]
    report = {"loaded": loaded, "missing": missing,
              "unexpected": unexpected}
    if verbose and (missing or unexpected):
        print("Missing keys:", missing)
        print("Unexpected keys:", unexpected)
    return _unflatten(flat_p), _unflatten(flat_b), report


def restore_torch_checkpoint(path: str, state):
    """Load a reference ``.pth`` file into a TrainState (weights only —
    the torch optimizer state has no optax counterpart; reference
    set_model loads only ``d['model']``, utils.py:526).  Returns
    ``(state, epoch)``."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    sd = d.get("model", d) if isinstance(d, dict) else d
    if hasattr(sd, "state_dict"):          # a whole pickled module
        sd = sd.state_dict()
    epoch = int(d.get("epoch", 0)) if isinstance(d, dict) else 0
    params, batch_stats, report = convert_torch_state_dict(
        sd, state.params, state.batch_stats or {})
    print(f"torch import: {len(report['loaded'])} tensors loaded from "
          f"{path}")
    return state._replace(params=params,
                          batch_stats=batch_stats or state.batch_stats), \
        epoch
