"""Import reference (ubc-vision/quadraturefields) torch checkpoints.

The reference saves per-stage `torch.save` dicts of bare state_dicts
(train_ngp_nerf_sg_occ.py:357-364, train_field.py:411-419,
train_finetune.py:561-570, train_fit_sg.py:484-492):

    {"estimator": OccGridEstimator.state_dict(),
     "model" | "field_model" | "radiance_field": module.state_dict()}

This tool maps them onto this framework's orbax checkpoint trees so a
reference user can hand a trained `ngp.pth` / `model.pth` straight to
the TPU trainers (the stage-2/4/5 `--ckpt_path` contracts in
train/stage{2,4,5}_*.py).

Why the mapping is exact: the corner-layout `interp="cube"` encoder
replicates tcnn's HashGrid semantics bit-for-layout — same level scale
formula (base*growth^l - 1, resolution = ceil(scale)+1), same
dense-when-it-fits sizing padded to 8 entries, same x-fastest stride
indexing and xor-prime spatial hash, same `pos = x*scale + 0.5`
trilinear rule (ops/hashgrid.py). So the tcnn grid blob reshapes
directly into our `[total_entries, F]` table. FullyFusedMLP weight
matrices are row-major [out, in_padded] slabs concatenated
input->hidden->output; torch nn.Linear weights are [out, in]. Both
transpose into our `{"w": [in, out], "b": [out]}` layers (ops/mlp.py).

tcnn packs `NetworkWithInputEncoding.params` as ONE flat tensor with
the NETWORK weights first, then the encoding table (tcnn
NetworkWithInputEncoding::set_params). Because that ordering is an
upstream implementation detail, `--blob_order auto` (default) verifies
it per checkpoint: the grid segment of a trained NGP is dominated by
near-zero entries (U(-1e-4,1e-4) init, most of the hash table never
touched by gradients) while MLP weight slabs are O(1e-1) dense — the
candidate split with the sparser grid half wins. Use
`--blob_order network_first|encoding_first` to pin it.

Usage (flags mirror the reference trainer flags that shaped the model):

  python tools/convert_reference_ckpt.py --stage 1 \
      --in ckpts/lego/nerf/ngp.pth --out ckpts_tpu/lego/nerf/ngp \
      --num_lobes 6 --log2_hashmap_size 19 --grid_resolution 128

  python tools/convert_reference_ckpt.py --stage 5 \
      --in ckpts/lego/sg/model.pth --out ckpts_tpu/lego/sg/model \
      --num_lobes 6

Requires torch (CPU build is enough) to deserialize the .pth.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from quadraturefields_tpu.models.field import FieldConfig
from quadraturefields_tpu.models.ngp import NGPConfig


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _round16(n: int) -> int:
    return -(-n // 16) * 16


def fused_mlp_widths(n_in: int, n_out: int, n_neurons: int = 64,
                     n_hidden_layers: int = 1):
    """FullyFusedMLP weight-matrix shapes [out, in], in tcnn order.

    tcnn pads the input and output widths to multiples of 16; hidden
    layers are n_neurons wide. n_hidden_layers counts layers BETWEEN
    input and output (tcnn network_config meaning, reference
    ngp.py:851-858).
    """
    shapes = [(n_neurons, _round16(n_in))]
    for _ in range(n_hidden_layers - 1):
        shapes.append((n_neurons, n_neurons))
    shapes.append((_round16(n_out), n_neurons))
    return shapes


def split_blob(blob: np.ndarray, grid_count: int, mlp_shapes,
               order: str = "auto"):
    """Split a tcnn NetworkWithInputEncoding params blob into
    (grid_params, [weight matrices])."""
    blob = blob.reshape(-1).astype(np.float32)
    net_count = int(sum(o * i for o, i in mlp_shapes))
    if blob.size != grid_count + net_count:
        raise ValueError(
            f"params blob has {blob.size} entries; expected grid "
            f"{grid_count} + network {net_count} = "
            f"{grid_count + net_count}. Check --n_levels/"
            f"--log2_hashmap_size/--max_resolution against the "
            f"training flags."
        )
    cands = {
        "network_first": (blob[net_count:], blob[:net_count]),
        "encoding_first": (blob[:grid_count], blob[grid_count:]),
    }
    if order == "auto":
        def sparsity(c):
            g = cands[c][0]
            return float(np.mean(np.abs(g) < 1e-3))
        order = max(cands, key=sparsity)
        s_win = {c: round(float(np.mean(np.abs(cands[c][0]) < 1e-3)), 3)
                 for c in cands}
        print(f"blob_order auto -> {order} (grid near-zero fraction: "
              f"{s_win})")
    grid, net = cands[order]
    mats, off = [], 0
    for (o, i) in mlp_shapes:
        mats.append(net[off:off + o * i].reshape(o, i))
        off += o * i
    return grid, mats


def fused_mlp_to_layers(mats, n_in: int, n_out: int):
    """tcnn [out, in_padded] slabs -> our {"layers": [{"w": [in, out]}]}.

    tcnn pads encoding outputs to the padded input width with ONES, so
    a trained checkpoint's pad-column weights act as a bias; bias-free
    parity requires n_in % 16 == 0 (true for every reference config:
    L*F = 32). The final slab's pad ROWS are dead outputs — dropped.
    """
    if n_in % 16 != 0:
        raise ValueError(
            f"fused-MLP input width {n_in} is not 16-aligned; tcnn's "
            f"one-padding would need a bias fold this converter does "
            f"not implement"
        )
    layers = []
    for k, m in enumerate(mats):
        if k == len(mats) - 1:
            m = m[:n_out]
        layers.append({"w": m.T.astype(np.float32)})
    return {"layers": layers}


def linear_stack_to_layers(sd, prefix: str, num_layers: int):
    """BasicDecoder state_dict (layers.{i} + lout) -> our mlp params."""
    layers = []
    for i in range(num_layers):
        w = _np(sd[f"{prefix}.layers.{i}.weight"]).astype(np.float32)
        layer = {"w": w.T}
        b = sd.get(f"{prefix}.layers.{i}.bias")
        if b is not None:
            layer["b"] = _np(b).astype(np.float32)
        layers.append(layer)
    w = _np(sd[f"{prefix}.lout.weight"]).astype(np.float32)
    layer = {"w": w.T}
    b = sd.get(f"{prefix}.lout.bias")
    if b is not None:
        layer["b"] = _np(b).astype(np.float32)
    layers.append(layer)
    return {"layers": layers}


def convert_ngp(sd, cfg: NGPConfig, blob_order: str = "auto"):
    """NGPRadianceField{,SGNew} state_dict -> our ngp params tree."""
    if cfg.layout != "corner" or cfg.interp != "cube":
        raise ValueError(
            "reference checkpoints carry tcnn corner-layout tables; "
            "convert with layout='corner', interp='cube' (retrain or "
            "distill to move to the cell/tet TPU-fast encodings)"
        )
    hg = cfg.hashgrid
    grid_count = hg.total_entries * hg.n_features
    n_in = hg.output_dim
    n_out = 1 + cfg.geo_feat_dim
    shapes = fused_mlp_widths(n_in, n_out)
    grid, mats = split_blob(
        _np(sd["mlp_base.params"]), grid_count, shapes, blob_order
    )
    params = {
        "table": grid.reshape(hg.total_entries, hg.n_features).astype(
            np.dtype(cfg.table_dtype)
        ),
        "mlp_base": fused_mlp_to_layers(mats, n_in, n_out),
    }
    if cfg.head in ("sg", "sg_old"):
        # both SG variants use a torch BasicDecoder head (reference
        # ngp.py:365-383 new / ngp.py:546-556 old) — same Linear-stack
        # state_dict shape, only the output dim differs (7 vs 15 per
        # lobe; encoded in cfg.head_output_dim)
        params["mlp_head"] = linear_stack_to_layers(
            sd, "mlp_head", cfg.num_layers
        )
    elif cfg.head == "mlp":
        # NGPRadianceField's head is a tcnn.Network (reference
        # ngp.py:729-746) — a second fused blob, bias-free
        n_in_h = cfg.dir_enc_dim + cfg.geo_feat_dim
        shapes_h = fused_mlp_widths(
            n_in_h, 3, n_hidden_layers=2
        )
        _, mats_h = split_blob(
            _np(sd["mlp_head.params"]), 0, shapes_h, "encoding_first"
        )
        params["mlp_head"] = fused_mlp_to_layers(mats_h, n_in_h, 3)
    return params


def convert_field(sd, cfg: FieldConfig):
    """reference Field state_dict (tcnn.Encoding + BasicDecoder,
    field.py:157-185) -> our field params tree. The encoding-only blob
    IS the grid (no network segment to split)."""
    hg = cfg.hashgrid
    grid_count = hg.total_entries * hg.n_features
    blob = _np(sd["xyz_encoder.params"]).reshape(-1).astype(np.float32)
    if blob.size != grid_count:
        raise ValueError(
            f"xyz_encoder blob {blob.size} != expected {grid_count}; "
            f"check --field_log2_hashmap_size/--field_max_res/--scale"
        )
    return {
        "table": blob.reshape(hg.total_entries, hg.n_features),
        "decoder": linear_stack_to_layers(sd, "decoder_field", 2),
    }


def convert_estimator(sd, grid_resolution: int):
    """nerfacc OccGridEstimator buffers -> (occs [res^3], binaries
    [res,res,res]). Single-level grids only (the pipeline's case)."""
    occs = _np(sd["occs"]).reshape(-1).astype(np.float32)
    if occs.size != grid_resolution**3:
        raise ValueError(
            f"estimator occs has {occs.size} cells, expected "
            f"{grid_resolution ** 3}; pass --grid_resolution"
        )
    binaries = _np(sd["binaries"]).astype(bool).reshape(
        grid_resolution, grid_resolution, grid_resolution
    )
    return occs, binaries


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--stage", type=int, required=True,
                   choices=[1, 2, 4, 5])
    p.add_argument("--in", dest="inp", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--blob_order", type=str, default="auto",
                   choices=["auto", "network_first", "encoding_first"])
    # reference model flags (same names/defaults as the trainers)
    p.add_argument("--num_lobes", type=int, default=3)
    p.add_argument("--log2_hashmap_size", type=int, default=19)
    p.add_argument("--n_levels", type=int, default=16)
    p.add_argument("--max_resolution", type=int, default=4096)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--head", type=str, default="sg",
                   choices=["sg", "sg_old", "mlp", "none"])
    p.add_argument("--grid_resolution", type=int, default=128)
    p.add_argument("--unbounded", action="store_true")
    # field flags (stage 2/4: reference train_field.py / finetune)
    p.add_argument("--scale", type=float, default=0.5)
    p.add_argument("--field_log2_hashmap_size", type=int, default=24)
    p.add_argument("--field_max_res", type=int, default=512)
    p.add_argument("--field_hidden_size", type=int, default=32)
    args = p.parse_args(argv)

    import torch

    ckpt = torch.load(args.inp, map_location="cpu")
    occs, binaries = convert_estimator(
        ckpt["estimator"], args.grid_resolution
    )

    ngp_cfg = NGPConfig(
        head=args.head, num_g_lobes=args.num_lobes,
        log2_hashmap_size=args.log2_hashmap_size,
        n_levels=args.n_levels, max_resolution=args.max_resolution,
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        unbounded=args.unbounded,
    )
    field_cfg = FieldConfig(
        scale=args.scale,
        log2_hashmap_size=args.field_log2_hashmap_size,
        max_resolution=args.field_max_res,
        hidden_size=args.field_hidden_size,
    )

    if args.stage == 1:
        # ngp.pth {"estimator", "model"} -> stage-2/4 --ckpt_path tree
        tree = {
            "params": convert_ngp(
                ckpt["model"], ngp_cfg, args.blob_order
            ),
            "occs": occs, "binaries": binaries,
        }
    elif args.stage == 2:
        # train_field.py model.pth {"estimator", "model"(field)} ->
        # our Stage2Trainer.save tree (stage2_field.py)
        tree = {
            "field_params": convert_field(ckpt["model"], field_cfg),
            "occs": occs, "binaries": binaries,
        }
    elif args.stage == 4:
        # train_finetune.py model.pth {"estimator", "field_model",
        # "radiance_field"} (train_finetune.py:561-570) -> our
        # Stage4Trainer.save tree, directly consumable by stage 5
        tree = {
            "radiance_field": convert_ngp(
                ckpt["radiance_field"], ngp_cfg, args.blob_order
            ),
            "field_model": convert_field(ckpt["field_model"], field_cfg),
            "occs": occs, "binaries": binaries,
        }
    else:
        # train_fit_sg.py model.pth {"estimator", "radiance_field"} ->
        # the baking/eval teacher tree (stage5 template keys)
        tree = {
            "radiance_field": convert_ngp(
                ckpt["radiance_field"], ngp_cfg, args.blob_order
            ),
            "occs": occs, "binaries": binaries,
        }

    from quadraturefields_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(args.out, tree)
    n = sum(x.size for x in jax_leaves(tree))
    print(f"wrote {args.out} ({n} params)")


def jax_leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


if __name__ == "__main__":
    main()
