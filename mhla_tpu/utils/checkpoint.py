"""Checkpoint save/load via orbax (sharded, async-capable) with
latest-symlink resume semantics.

Replaces the reference's three checkpoint backends (DDP/DeepSpeed/FSDP
save/load with ``add_symlink`` — ``diffusion/utils/checkpoint.py:30-545``)
with one: orbax handles sharded parameters natively, and ``latest`` is a
symlink just like the reference so ``--resume_from=latest`` works the same.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str, step: int) -> Path:
    return Path(work_dir) / "checkpoints" / f"step_{step:08d}"


def save_checkpoint(
    work_dir: str,
    step: int,
    state: Any,
    keep: int = 3,
    add_symlink: bool = True,
) -> str:
    """Save a pytree (TrainState or params) and update the `latest` symlink."""
    path = _ckpt_dir(work_dir, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute() / "state", state, force=True)
    ckptr.wait_until_finished()
    if add_symlink:
        link = path.parent / "latest"
        if link.is_symlink() or link.exists():
            link.unlink()
        link.symlink_to(path.name)
    _prune(path.parent, keep)
    return str(path)


def _prune(root: Path, keep: int) -> None:
    ckpts = sorted(p for p in root.glob("step_*") if p.is_dir())
    for p in ckpts[:-keep]:
        import shutil

        shutil.rmtree(p, ignore_errors=True)


def _is_complete(path: Path) -> bool:
    """A checkpoint is complete once orbax committed the `state` dir; a
    killed save leaves only `state.orbax-checkpoint-tmp*` behind, and
    resuming from that hangs or crashes the restore."""
    return (path / "state").exists()


def resolve_resume_path(work_dir: str, resume_from: str = "latest") -> Optional[str]:
    """Find the checkpoint to resume from ('latest' follows the symlink).
    Incomplete checkpoints (interrupted saves) are skipped — resume falls
    back to the newest COMPLETE step, or a fresh start."""
    root = Path(work_dir) / "checkpoints"
    if resume_from == "latest":
        link = root / "latest"
        if link.exists() and _is_complete(link.resolve()):
            return str(link.resolve())
        ckpts = sorted(
            p for p in root.glob("step_*") if p.is_dir() and _is_complete(p)
        )
        return str(ckpts[-1]) if ckpts else None
    p = Path(resume_from)
    return str(p) if p.exists() and _is_complete(p) else None


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree with the same structure/shardings as ``target``."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute() / "state", target=target)


def load_params_from_checkpoint(path: str, template: Any) -> Any:
    """Load *model params* from a checkpoint holding either a raw params
    pytree or a full TrainState (in which case EMA params are preferred,
    then raw params) — the reference's teacher/pretrained load accepts the
    same mix (``load_checkpoint`` backends, ``diffusion/utils/checkpoint.py``).

    ``template`` must be the FULL model parameter tree (never an adapter
    tree); leaves are validated against it shape-by-shape.
    """
    import jax.numpy as jnp

    try:
        return load_checkpoint(path, template)
    except Exception:
        pass  # structure mismatch: probably a TrainState checkpoint
    raw = ocp.StandardCheckpointer().restore(Path(path).absolute() / "state")
    if isinstance(raw, dict):
        for key in ("ema_params", "params"):
            if isinstance(raw.get(key), dict):
                raw = raw[key]
                break
    leaves_t, treedef = jax.tree.flatten(template)
    leaves_r = jax.tree.leaves(raw)
    if len(leaves_r) != len(leaves_t):
        raise ValueError(
            f"checkpoint at {path} has {len(leaves_r)} arrays, template has "
            f"{len(leaves_t)} — not a matching params/TrainState checkpoint"
        )
    coerced = []
    for r, t in zip(leaves_r, leaves_t):
        r = jnp.asarray(r)
        if r.shape != t.shape:
            raise ValueError(
                f"shape mismatch restoring {path}: {r.shape} vs {t.shape}"
            )
        coerced.append(r.astype(t.dtype))
    return jax.tree.unflatten(treedef, coerced)


def checkpoint_step(path: str) -> int:
    name = os.path.basename(path.rstrip("/"))
    return int(name.split("_")[-1]) if name.startswith("step_") else -1
