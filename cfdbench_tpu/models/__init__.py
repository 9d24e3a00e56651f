"""Model registry.

``init_model(args)`` is the single registry mapping the ``--model``
string to a constructed model, mirroring
``src/utils/autoregressive.py:41-179`` (autoregressive) and
``src/train.py:254-292`` (non-autoregressive).
"""

from __future__ import annotations

from typing import Tuple

from ..config import Args
from .fno import Fno2d

__all__ = ["init_auto_model", "get_input_shapes", "Fno2d"]


def get_input_shapes(args: Args) -> Tuple[int, int, int]:
    """(n_rows, n_cols, n_case_params) per data_name.

    Mirrors ``src/utils/autoregressive.py:19-38`` for tube/dam/cavity.
    Deviation (documented): the reference claims cylinder is padded to
    (+2, +1) but its active loader keeps 64×64 (SURVEY.md §2.2
    inconsistency); we return the true unpadded shape for cylinder.
    """
    if any(x in args.data_name for x in ["tube", "dam"]):
        n_rows, n_cols = args.num_rows + 2, args.num_cols + 1
    else:
        n_rows, n_cols = args.num_rows, args.num_cols
    n_case_params = 8 if "cylinder" in args.data_name else 5
    return n_rows, n_cols, n_case_params


def init_auto_model(args: Args, n_case_params: int = None, field_shape=None):
    """Construct an autoregressive model from args.

    ``n_case_params`` / ``field_shape`` may be supplied from the actual
    dataset (shape-driven, fixing the reference's hardcoded-shape
    fragility); they default to ``get_input_shapes``.
    """
    n_rows, n_cols, default_p = get_input_shapes(args)
    if field_shape is not None:
        n_rows, n_cols = field_shape
    p = n_case_params if n_case_params is not None else default_p

    if args.model == "ffno":
        from .ffno import Ffno2d

        return Ffno2d(
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=p,
            num_layers=args.fno_depth,
            hidden_dim=args.fno_hidden_dim,
            modes1=args.fno_modes_x,
            modes2=args.fno_modes_y,
        )
    if args.model == "fno":
        return Fno2d(
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=p,
            num_layers=args.fno_depth,
            hidden_dim=args.fno_hidden_dim,
            modes1=args.fno_modes_x,
            modes2=args.fno_modes_y,
        )
    if args.model == "unet":
        from .unet import UNet

        return UNet(
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=p,
            insert_case_params_at=args.unet_insert_case_params_at,
            dim=args.unet_dim,
        )
    if args.model == "resnet":
        from .resnet import ResNet

        return ResNet(
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=p,
            hidden_chan=args.resnet_hidden_chan,
            num_blocks=args.resnet_depth,
            kernel_size=args.resnet_kernel_size,
            padding=args.resnet_padding,
        )
    if args.model == "auto_ffn":
        from .point import AutoFfn

        return AutoFfn(
            input_field_dim=n_rows * n_cols,
            num_case_params=p,
            width=args.autoffn_width,
            depth=args.autoffn_depth,
        )
    if args.model == "auto_deeponet":
        from .point import AutoDeepONet

        return AutoDeepONet(
            branch_dim=n_rows * n_cols + p,
            width=args.deeponet_width,
            trunk_depth=args.trunk_depth,
            branch_depth=args.branch_depth,
            act_name=args.act_fn,
        )
    if args.model == "auto_edeeponet":
        from .point import AutoEDeepONet

        return AutoEDeepONet(
            dim_branch1=n_rows * n_cols,
            dim_branch2=p,
            width=args.autoedeeponet_width,
            trunk_depth=args.autoedeeponet_depth,
            branch_depth=args.autoedeeponet_depth,
            act_name=args.autoedeeponet_act_fn,
        )
    if args.model == "auto_deeponet_cnn":
        from .point import AutoDeepONetCnn

        return AutoDeepONetCnn(
            in_chan=args.in_chan,
            num_case_params=p,
        )
    raise ValueError(f"Invalid model name: {args.model}")


def init_nonauto_model(args: Args, n_case_params: int = None):
    """Construct a non-autoregressive model (``src/train.py:254-292``)."""
    p = n_case_params
    if p is None:
        p = 8 if "cylinder" in args.data_name else 5
    if args.model == "deeponet":
        from .nonauto import DeepONet

        return DeepONet(
            n_case_params=p,
            width=args.deeponet_width,
            trunk_depth=args.trunk_depth,
            branch_depth=args.branch_depth,
            act_name=args.act_fn,
            act_norm=bool(args.act_scale_invariant),
            act_on_output=bool(args.act_on_output),
        )
    if args.model == "ffn":
        from .nonauto import FfnModel

        return FfnModel(
            n_case_params=p,
            width=args.ffn_width,
            depth=args.ffn_depth,
        )
    raise ValueError(f"Invalid model name: {args.model}")
