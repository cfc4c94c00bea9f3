"""Checkpoint save/restore (Orbax) with reference-parity logical contents.

The reference saves ``{'state_dict', 'optimizer', 'scheduler', 'epoch',
'global_iter'[, 'last_iter']}`` per epoch plus a ``latest.pth`` pointer and an
``iter.pth`` for iteration-level resume (``train.py:273-301``, SURVEY §5.4).
Here the same logical contents live in an Orbax checkpoint directory with a
``latest`` step pointer; ``last_iter`` enables the sampler skip on resume.

``load_torch_resnet50`` imports the torchvision pretrained backbone weights
(the reference's ``ckpts/resnet50-0676ba61.pth``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))


def save_checkpoint(ckpt_dir: str, state, epoch: int, global_iter: int,
                    last_iter: Optional[int] = None):
    """Persist train state (params/batch_stats/opt_state) + progress."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "global_iter": np.asarray(global_iter),
    }
    if last_iter is not None:
        payload["last_iter"] = np.asarray(last_iter)
    mgr = _manager(ckpt_dir)
    mgr.save(global_iter, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(ckpt_dir: str, state):
    """Restore the latest checkpoint into ``state``; returns
    (state, epoch, global_iter, last_iter|None) or None if absent."""
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
        "global_iter": np.asarray(0),
    }
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        last_iter = None
    except Exception:
        template["last_iter"] = np.asarray(0)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        last_iter = int(restored["last_iter"])
    mgr.close()
    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"])
    return new_state, int(restored["epoch"]), int(restored["global_iter"]), last_iter


def load_torch_resnet50(params: Dict[str, Any], batch_stats: Dict[str, Any],
                        pth_path: str):
    """Graft torchvision resnet50 weights (``resnet50-0676ba61.pth``) into the
    model's ``img_backbone`` subtree. Returns updated (params, batch_stats)."""
    import torch
    from ..models.resnet import convert_torch_resnet50
    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    bp, bs = convert_torch_resnet50(sd)
    params = dict(params)
    batch_stats = dict(batch_stats)
    params["img_backbone"] = bp
    batch_stats["img_backbone"] = bs
    return params, batch_stats
