"""Dataset registry: ``data_name`` grammar → packed datasets.

Mirrors ``get_dataset`` / ``get_auto_dataset``
(``src/dataset/__init__.py:12-125``): ``data_name`` is
``<problem>_<subsets>`` where problem ∈ {cavity, tube, dam, cylinder}
and subsets is any combination mentioning prop/bc/geo. Splits are the
seed-0 shuffled 80/10/10 case-level split.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

from .core import PROBLEMS, collect_case_dirs, split_cases
from .datasets import (
    AutoDataset,
    FrameDataset,
    build_auto_dataset,
    build_frame_dataset,
)

__all__ = [
    "AutoDataset",
    "FrameDataset",
    "get_dataset",
    "get_auto_dataset",
]


def _parse(data_name: str) -> Tuple[str, str]:
    problem = data_name.split("_")[0]
    assert problem in PROBLEMS, f"invalid problem: {problem}"
    subsets = data_name[len(problem) + 1:]
    return problem, subsets


def get_dataset(
    data_name: str,
    data_dir: Path,
    norm_props: bool,
    norm_bc: bool,
    seed: int = 0,
) -> Tuple[FrameDataset, FrameDataset, FrameDataset]:
    """Frame datasets (train, dev, test) for non-autoregressive models."""
    problem, subsets = _parse(data_name)
    case_dirs = collect_case_dirs(Path(data_dir) / problem, subsets)
    splits = split_cases(case_dirs, seed=seed)
    return tuple(
        build_frame_dataset(problem, s, norm_props, norm_bc) for s in splits
    )


def get_auto_dataset(
    data_dir: Path,
    data_name: str,
    delta_time: float,
    norm_props: bool,
    norm_bc: bool,
    load_splits: List[str] = ["train", "dev", "test"],
    seed: int = 0,
    stable_state_diff: float = 0.001,
    cache_dir=None,
) -> Tuple[
    Optional[AutoDataset], Optional[AutoDataset], Optional[AutoDataset]
]:
    """Pair datasets (train, dev, test) for autoregressive models.

    ``load_splits`` lets callers skip building unused splits (the
    reference supports this for cylinder only; here it works for all
    problems — e.g. the multistep driver loads only "test",
    ``src/test_multistep.py:186-193``).
    """
    assert delta_time > 0
    problem, subsets = _parse(data_name)
    case_dirs = collect_case_dirs(Path(data_dir) / problem, subsets)
    splits = split_cases(case_dirs, seed=seed)
    out = []
    for name, split_dirs in zip(("train", "dev", "test"), splits):
        if name in load_splits:
            out.append(
                build_auto_dataset(
                    problem,
                    split_dirs,
                    norm_props=norm_props,
                    norm_bc=norm_bc,
                    delta_time=delta_time,
                    stable_state_diff=stable_state_diff,
                    cache_dir=cache_dir,
                )
            )
        else:
            out.append(None)
    return tuple(out)
