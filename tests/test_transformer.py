import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.models import transformer as tfm


def _copy_mha_params(torch_mha, embed_dim, vdim=None):
    """Extract torch.nn.MultiheadAttention weights into our param dict."""
    sd = {k: v.detach().numpy() for k, v in torch_mha.state_dict().items()}
    if "in_proj_weight" in sd:
        w = sd["in_proj_weight"]
        b = sd["in_proj_bias"]
        d = embed_dim
        qw, kw, vw = w[:d], w[d:2 * d], w[2 * d:]
        qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    else:
        qw, kw, vw = (sd["q_proj_weight"], sd["k_proj_weight"],
                      sd["v_proj_weight"])
        b = sd["in_proj_bias"]
        d = embed_dim
        qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {"kernel": sd["out_proj.weight"].T,
                     "bias": sd["out_proj.bias"]},
    }


def test_mha_self_attention_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    d, h, b, n = 32, 4, 3, 11
    tm = torch.nn.MultiheadAttention(d, h, batch_first=True)
    tm.eval()
    x = torch.randn(b, n, d)
    pad = torch.zeros(b, n, dtype=torch.bool)
    pad[0, 7:] = True  # padded keys
    with torch.no_grad():
        ref, _ = tm(x, x, x, key_padding_mask=pad, need_weights=False)

    mha = tfm.MultiHeadAttention(d, h)
    params = _copy_mha_params(tm, d)
    ours = mha.apply({"params": params}, jnp.asarray(x.numpy()),
                     jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
                     key_valid=jnp.asarray(~pad.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_mha_cross_attention_vdim_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    d, h, b, nq, nk = 64, 4, 2, 5, 9
    # the concat-position cross-attention shape: q,k at 2*d, values at d
    tm = torch.nn.MultiheadAttention(2 * d, h, vdim=d, batch_first=True)
    tm.eval()
    q = torch.randn(b, nq, 2 * d)
    k = torch.randn(b, nk, 2 * d)
    v = torch.randn(b, nk, d)
    with torch.no_grad():
        ref, _ = tm(q, k, v, need_weights=False)

    mha = tfm.MultiHeadAttention(2 * d, h)
    params = _copy_mha_params(tm, 2 * d, vdim=d)
    ours = mha.apply({"params": params}, jnp.asarray(q.numpy()),
                     jnp.asarray(k.numpy()), jnp.asarray(v.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_mha_additive_bias():
    # bias shifts logits pre-softmax: a huge bias on one key forces all
    # attention there
    d, h, b, n = 16, 2, 1, 6
    mha = tfm.MultiHeadAttention(d, h)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, n, d))
    params = mha.init(rng, x, x, x)["params"]
    bias = jnp.zeros((b, h, n, n)).at[:, :, :, 3].set(1e4)
    out = mha.apply({"params": params}, x, x, x, bias=bias)
    v = x @ params["v_proj"]["kernel"] + params["v_proj"]["bias"]
    vh = v.reshape(b, n, h, d // h)[:, 3]  # all rows attend key 3
    expected = vh.reshape(b, 1, d).repeat(n, 1)
    expected = expected @ params["out_proj"]["kernel"] + \
        params["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-4)


def test_ensure_some_valid():
    v = jnp.array([[True, False], [False, False]])
    out = tfm.ensure_some_valid(v)
    assert out.tolist() == [[True, False], [True, False]]


def test_inverse_sigmoid_roundtrip():
    x = jnp.linspace(0.01, 0.99, 11)
    y = jax.nn.sigmoid(tfm.inverse_sigmoid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
