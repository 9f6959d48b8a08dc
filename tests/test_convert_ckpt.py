"""tools/convert_reference_ckpt.py — reference .pth -> orbax tree.

Builds synthetic reference state dicts in the exact tcnn/torch layouts
(flat NetworkWithInputEncoding params blob, BasicDecoder layers.{i} +
lout, nerfacc estimator buffers — reference train_ngp_nerf_sg_occ.py:
357-364, field.py:157-185) and checks the converter reproduces our
param trees exactly, including the blob-order auto-detection and the
fused-MLP pad-row/transpose handling.
"""
import importlib.util
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")

from quadraturefields_tpu.models.field import FieldConfig, field_init
from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init

spec = importlib.util.spec_from_file_location(
    "convert_reference_ckpt", "/root/repo/tools/convert_reference_ckpt.py"
)
crc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(crc)


# L*F must be 16-aligned for the bias-free fused-MLP mapping (true for
# every reference config, L*F=32); geo_feat_dim=12 -> n_out=13 pads to
# 16, exercising the dead-pad-row drop.
NGP_CFG = NGPConfig(
    head="sg", n_levels=8, log2_hashmap_size=8, max_resolution=64,
    geo_feat_dim=12, num_g_lobes=2, hidden_size=32, num_layers=2,
)
FIELD_CFG = FieldConfig(
    scale=0.5, log2_hashmap_size=8, max_resolution=64, hidden_size=16,
)


def _fused_blob(mlp_params, n_in, n_out, rng):
    """Pack our {"layers": [{"w": [in, out]}]} as a tcnn FullyFusedMLP
    slab sequence ([out, in] row-major, output rows padded to 16 with
    garbage — tcnn's dead pad outputs)."""
    slabs = []
    for k, layer in enumerate(mlp_params["layers"]):
        m = np.asarray(layer["w"]).T  # [out, in]
        if k == len(mlp_params["layers"]) - 1 and m.shape[0] % 16:
            pad = crc._round16(m.shape[0]) - m.shape[0]
            m = np.concatenate(
                [m, rng.normal(0.5, 0.2, (pad, m.shape[1]))], axis=0
            )
        slabs.append(m.reshape(-1))
    return np.concatenate(slabs).astype(np.float32)


def test_convert_ngp_roundtrip_and_blob_autodetect():
    params = jax.tree_util.tree_map(
        np.asarray, ngp_init(jax.random.PRNGKey(0), NGP_CFG)
    )
    rng = np.random.default_rng(0)
    hg = NGP_CFG.hashgrid
    n_in, n_out = hg.output_dim, 1 + NGP_CFG.geo_feat_dim
    net = _fused_blob(params["mlp_base"], n_in, n_out, rng)
    grid = params["table"].reshape(-1).astype(np.float32)
    # tcnn order: network first, then encoding (set_params)
    blob = np.concatenate([net, grid])

    sd = {"mlp_base.params": torch.from_numpy(blob)}
    for i, layer in enumerate(params["mlp_head"]["layers"]):
        name = (
            f"mlp_head.layers.{i}"
            if i < len(params["mlp_head"]["layers"]) - 1
            else "mlp_head.lout"
        )
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T)
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(layer["b"]))

    out = crc.convert_ngp(sd, NGP_CFG, blob_order="auto")

    np.testing.assert_array_equal(out["table"], params["table"])
    for got, want in zip(
        out["mlp_base"]["layers"], params["mlp_base"]["layers"]
    ):
        np.testing.assert_allclose(got["w"], want["w"], atol=0)
        assert "b" not in got
    for got, want in zip(
        out["mlp_head"]["layers"], params["mlp_head"]["layers"]
    ):
        np.testing.assert_allclose(got["w"], want["w"], atol=0)
        np.testing.assert_allclose(got["b"], want["b"], atol=0)


def test_blob_order_wrong_size_raises():
    with pytest.raises(ValueError, match="params blob"):
        crc.split_blob(
            np.zeros(100, np.float32), 64,
            crc.fused_mlp_widths(16, 13), "auto",
        )


def test_convert_field_roundtrip():
    params = jax.tree_util.tree_map(
        np.asarray, field_init(jax.random.PRNGKey(1), FIELD_CFG)
    )
    sd = {
        "xyz_encoder.params": torch.from_numpy(
            params["table"].reshape(-1)
        )
    }
    layers = params["decoder"]["layers"]
    for i, layer in enumerate(layers):
        name = (
            f"decoder_field.layers.{i}"
            if i < len(layers) - 1 else "decoder_field.lout"
        )
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T)
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(layer["b"]))

    out = crc.convert_field(sd, FIELD_CFG)
    np.testing.assert_array_equal(out["table"], params["table"])
    for got, want in zip(out["decoder"]["layers"], layers):
        np.testing.assert_allclose(got["w"], want["w"], atol=0)
        np.testing.assert_allclose(got["b"], want["b"], atol=0)


def test_convert_estimator():
    res = 16
    occs = np.random.default_rng(2).random(res**3).astype(np.float32)
    binaries = occs > 0.5
    sd = {
        "occs": torch.from_numpy(occs),
        "binaries": torch.from_numpy(
            binaries.reshape(res, res, res)
        ),
    }
    o, b = crc.convert_estimator(sd, res)
    np.testing.assert_array_equal(o, occs)
    np.testing.assert_array_equal(
        b, binaries.reshape(res, res, res)
    )
    with pytest.raises(ValueError, match="occs"):
        crc.convert_estimator(sd, res + 1)


def test_cell_layout_rejected():
    cfg = NGPConfig(layout="cell", n_levels=8, log2_hashmap_size=8,
                    max_resolution=64)
    with pytest.raises(ValueError, match="corner"):
        crc.convert_ngp({}, cfg)


def test_convert_ngp_sg_old_roundtrip():
    """NGPRadianceFieldSG (old-SG layout, reference ngp.py:473-654):
    same BasicDecoder head state_dict shape as SG-new, head dim
    3 + L*3*5 — the converter must ingest it unchanged."""
    cfg = NGPConfig(
        head="sg_old", n_levels=8, log2_hashmap_size=8,
        max_resolution=64, geo_feat_dim=12, num_g_lobes=3,
        hidden_size=32, num_layers=2,
    )
    assert cfg.head_output_dim == 48
    params = jax.tree_util.tree_map(
        np.asarray, ngp_init(jax.random.PRNGKey(3), cfg)
    )
    rng = np.random.default_rng(3)
    hg = cfg.hashgrid
    n_in, n_out = hg.output_dim, 1 + cfg.geo_feat_dim
    net = _fused_blob(params["mlp_base"], n_in, n_out, rng)
    grid = params["table"].reshape(-1).astype(np.float32)
    sd = {"mlp_base.params": torch.from_numpy(
        np.concatenate([net, grid]))}
    for i, layer in enumerate(params["mlp_head"]["layers"]):
        name = (
            f"mlp_head.layers.{i}"
            if i < len(params["mlp_head"]["layers"]) - 1
            else "mlp_head.lout"
        )
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(layer["w"]).T)
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(layer["b"]))

    out = crc.convert_ngp(sd, cfg, blob_order="auto")
    np.testing.assert_array_equal(out["table"], params["table"])
    for got, want in zip(
        out["mlp_head"]["layers"], params["mlp_head"]["layers"]
    ):
        np.testing.assert_allclose(got["w"], want["w"], atol=0)
        np.testing.assert_allclose(got["b"], want["b"], atol=0)
    assert out["mlp_head"]["layers"][-1]["w"].shape[1] == 48
