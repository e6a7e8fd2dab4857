"""Fused saliency-stats kernel vs the reference XLA formulas (CPU interpret
mode; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avdn_tpu.ops.losses import nss_loss
from avdn_tpu.ops.saliency_pallas import (
    saliency_stats_pallas,
    saliency_stats_xla,
    saliency_reductions,
)


@pytest.fixture(scope="module")
def maps():
    rng = np.random.default_rng(0)
    B = 4
    pred = rng.normal(0.3, 0.4, (B, 224, 224)).astype(np.float32)
    gt = (rng.uniform(0, 1, (B, 224, 224)) > 0.85).astype(np.float32)
    gt[2] = 0.0  # empty fixation item
    return jnp.asarray(pred), jnp.asarray(gt)


def test_stats_kernel_matches_xla(maps):
    pred, gt = maps
    want = np.asarray(saliency_stats_xla(pred, gt))
    got = np.asarray(saliency_stats_pallas(pred, gt, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-2)


@pytest.mark.parametrize("nss_r", [0, 1, -1])
def test_reductions_match_reference_nss(maps, nss_r):
    pred, gt = maps
    want_nss, want_valid = nss_loss(pred, gt, nss_r)
    neg_nss, valid, prec, rec = saliency_reductions(
        pred, gt, nss_r=nss_r, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want_valid))
    m = np.asarray(want_valid)
    np.testing.assert_allclose(
        np.asarray(neg_nss)[m], np.asarray(want_nss)[m], rtol=1e-4, atol=1e-4
    )


def test_reductions_ha_metrics(maps):
    pred, gt = maps
    _, _, prec, rec = saliency_reductions(pred, gt, use_pallas=False)
    pc = np.clip(np.asarray(pred), 0, 1).reshape(4, -1)
    g = np.asarray(gt).reshape(4, -1)
    tp = (pc * g).sum(1)
    np.testing.assert_allclose(np.asarray(prec), tp / pc.sum(1), rtol=1e-5)
    want_rec = np.where(g.sum(1) > 0, tp / np.maximum(g.sum(1), 1e-20), 0)
    np.testing.assert_allclose(np.asarray(rec), want_rec, rtol=1e-5)
