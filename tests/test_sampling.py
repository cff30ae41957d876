"""Parity of the sampling math vs the reference torch implementation
(``gsv_tts/GPT_SoVITS/GPT/utils.py``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.ops import sampling
from conftest import import_reference_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_utils():
    return import_reference_module("GPT_SoVITS/GPT/utils.py", "GPT_SoVITS.GPT.utils")


@pytest.mark.parametrize("top_k,top_p,temp,rp", [
    (15, 1.0, 1.0, 1.35),
    (5, 0.8, 0.7, 1.0),
    (3, 0.95, 1.3, 2.0),
    (1, 1.0, 1.0, 1.35),
])
def test_logits_to_probs_parity(ref_utils, top_k, top_p, temp, rp):
    rng = np.random.RandomState(0)
    B, V, P = 3, 101, 17
    logits = rng.randn(B, V).astype(np.float32) * 3
    prev = rng.randint(0, V, size=(B, P)).astype(np.int64)

    ref = ref_utils.logits_to_probs(
        torch.tensor(logits.copy()), torch.tensor(prev),
        temperature=temp, top_k=top_k, top_p=top_p, repetition_penalty=rp,
    ).numpy()

    ours = sampling.logits_to_probs(
        jnp.asarray(logits), jnp.asarray(prev.astype(np.int32)),
        temperature=temp, top_k=top_k, top_p=top_p, repetition_penalty=rp,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-6)


def test_sentinel_indices_dropped():
    """Slots holding the out-of-range sentinel must not distort the penalty."""
    B, V = 2, 50
    logits = np.linspace(-1, 1, B * V).reshape(B, V).astype(np.float32)
    prev_valid = np.array([[3, 7], [1, 2]], dtype=np.int32)
    prev_padded = np.array([[3, 7, V, V], [1, 2, V, V]], dtype=np.int32)
    a = sampling.logits_to_probs(jnp.asarray(logits), jnp.asarray(prev_valid),
                                 top_k=10, repetition_penalty=1.5)
    b = sampling.logits_to_probs(jnp.asarray(logits), jnp.asarray(prev_padded),
                                 top_k=10, repetition_penalty=1.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_gumbel_argmax_distribution():
    """The exponential-race draw must follow the target distribution."""
    probs = jnp.asarray([[0.5, 0.3, 0.2]], dtype=jnp.float32)
    draws = []
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4000)
    toks = jax.vmap(lambda k: sampling.gumbel_argmax(k, probs))(keys)
    toks = np.asarray(toks).ravel()
    freq = np.bincount(toks, minlength=3) / len(toks)
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2], atol=0.04)


def test_top_k_one_is_argmax():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(4, 33).astype(np.float32))
    tok, probs = sampling.sample(jax.random.PRNGKey(0), logits, top_k=1)
    np.testing.assert_array_equal(np.asarray(tok), np.argmax(np.asarray(logits), -1))
