"""Checkpointing with the reference's result-dir layout.

Layout contract (``src/train_auto.py:284-310``,
``src/utils/common.py:161-174``): per eval epoch a ``ckpt-{ep}/``
directory containing the model weights plus ``scores.json`` with
``{ep, train_loss, dev_loss, time}``; "best" is selected post-hoc by
scanning all ``ckpt-*/scores.json`` for the minimum ``dev_loss``.

Weights are stored via Orbax (``ckpt-{ep}/model/`` pytree dir) —
sharding-aware and async-capable; downstream tooling only depends on
the JSON artifacts, which are unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax

from ..data.core import dump_json, load_json

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from flax import serialization


def save_params(params: Any, ckpt_dir: Path) -> None:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if _HAS_ORBAX:
        import shutil

        path = (ckpt_dir / "model").absolute()
        # Crash-safe rotation: write the new checkpoint to a temp dir
        # first, rotate only after the save completed — a kill at any
        # point leaves an intact checkpoint under model/ or
        # backup_model/ (load_params falls back to the backup).
        tmp = (ckpt_dir / "model.tmp").absolute()
        if tmp.exists():  # leftover from a killed save
            shutil.rmtree(tmp)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, jax.device_get(params))
        if path.exists():
            # Reference backs up an existing model.pt before
            # overwriting (train_auto.py:297-300).
            backup = ckpt_dir / "backup_model"
            if backup.exists():
                shutil.rmtree(backup)
            path.rename(backup)
        tmp.rename(path)
    else:
        # Same crash-safety as the orbax path: temp file + atomic
        # os.replace, so a kill mid-write can't corrupt the only copy
        # (ADVICE r4 #4).
        import os

        target = ckpt_dir / "model.msgpack"
        tmp = ckpt_dir / "model.msgpack.tmp"
        tmp.write_bytes(serialization.to_bytes(jax.device_get(params)))
        os.replace(tmp, target)


def _explain_tree_mismatch(ckpt_path: Path, err: Exception) -> None:
    """Turn an Orbax structure-mismatch error into an actionable one for
    the known ``--model latent_diffusion2`` rename: checkpoints trained
    before the non-lite LatentDiffusionCfdModel2 existed carry the Lite
    param tree (conv ``cond_encoder`` instead of cross-attention) and
    must be re-tested/resumed with ``--model latent_diffusion_lite``."""
    names = ""
    try:
        with ocp.StandardCheckpointer() as ckptr:
            names = str(ckptr.metadata(ckpt_path.absolute()))
    except Exception:
        pass
    if "cond_encoder" in names or "cond_encoder" in str(err):
        raise ValueError(
            f"checkpoint at {ckpt_path} has the LatentDiffusion *Lite* "
            "param tree (conv cond_encoder); it was trained when "
            "--model latent_diffusion2 still meant the Lite variant. "
            "Re-run with --model latent_diffusion_lite."
        ) from err


def load_params(template: Any, ckpt_dir: Path) -> Any:
    ckpt_dir = Path(ckpt_dir)
    if _HAS_ORBAX:
        # backup_model is the rotated previous save — used when model/
        # is missing (kill between save_params' rotation steps) AND
        # when model/ exists but restore fails (kill mid-Orbax-write
        # left a partial dir): the rotation scheme's promise is that
        # one of the two is always intact.
        primary_err = None
        for name in ("model", "backup_model"):
            path = ckpt_dir / name
            if not path.exists():
                continue
            if name == "backup_model":
                print(
                    f"[checkpoints] {ckpt_dir / 'model'} "
                    + (
                        "failed to restore"
                        if primary_err is not None
                        else "is absent"
                    )
                    + "; trying backup_model (the previous rotated "
                    "save — expected after a save interrupted "
                    "mid-write)"
                )
            with ocp.StandardCheckpointer() as ckptr:
                target = jax.tree.map(
                    lambda x: jax.device_get(x), template
                )
                try:
                    return ckptr.restore(path.absolute(), target)
                except Exception as e:
                    # Structure mismatches are user errors — explain
                    # and abort, don't paper over with a backup that
                    # would mismatch identically.
                    _explain_tree_mismatch(path, e)
                    if primary_err is None:
                        primary_err = e
        if primary_err is not None:
            # Surface the PRIMARY (model/) failure — the backup's
            # error, if any, is usually the same mismatch repeated and
            # would bury the actionable message.
            raise primary_err
    msgpack = ckpt_dir / "model.msgpack"
    if not msgpack.exists() and _HAS_ORBAX:
        # Nothing restorable: name the real problem (no model/ or
        # backup_model/ under an Orbax install), not a msgpack file
        # this install never writes.
        raise FileNotFoundError(
            f"no checkpoint under {ckpt_dir}: neither model/ nor "
            "backup_model/ exists (nor a legacy model.msgpack)"
        )
    return serialization.from_bytes(template, msgpack.read_bytes())


def resume_shardings(state: Any, mesh) -> Any:
    """Sharding tree for re-placing a restored training state on a
    mesh (shared by every trainer's ``--resume`` block).

    Leaves that were mesh-placed keep their ``NamedSharding``;
    everything else — optimizer scalars like Adam's ``count``, created
    *uncommitted* by ``tx.init`` and therefore carrying a
    ``SingleDeviceSharding`` — is replicated. Snapshotting those
    single-device shardings verbatim would COMMIT the restored leaf to
    one device and poison the first jitted step with mixed device sets
    ("Received incompatible devices for jitted computation")."""
    from jax.sharding import NamedSharding

    from ..parallel.mesh import replicated_sharding

    rep = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: x.sharding
        if isinstance(getattr(x, "sharding", None), NamedSharding)
        else rep,
        state,
    )


def get_best_ckpt(output_dir: Path) -> Optional[Path]:
    """Scan ``ckpt-*/scores.json`` for min dev_loss
    (``src/utils/common.py:161-174``)."""
    best_loss, best_dir = float("inf"), None
    for ckpt_dir in sorted(Path(output_dir).glob("ckpt-*")):
        scores_file = ckpt_dir / "scores.json"
        if not scores_file.exists():
            continue
        dev_loss = load_json(scores_file)["dev_loss"]
        if dev_loss < best_loss:
            best_loss, best_dir = dev_loss, ckpt_dir
    return best_dir


def load_best_params(template: Any, output_dir: Path) -> Any:
    best = get_best_ckpt(output_dir)
    assert best is not None, f"no checkpoints under {output_dir}"
    return load_params(template, best)


def save_epoch_scores(
    ckpt_dir: Path, ep: int, train_loss: float, dev_loss: float, time_s: float
) -> None:
    dump_json(
        dict(ep=ep, train_loss=train_loss, dev_loss=dev_loss, time=time_s),
        Path(ckpt_dir) / "scores.json",
    )
