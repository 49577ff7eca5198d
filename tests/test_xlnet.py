"""XLNet relative-attention parity and surgery tests.

Mirrors the reference's XLNet surface (tests/cpu/surgery/test_xlnet.py): the
n=0 core must match HF's ``XLNetRelativeAttention.rel_attn_core`` exactly
(we test against the live torch module with shared random weights — stronger
than the reference's model-level no-op check), n=1 must change outputs, and
negative n is rejected.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attention_softmax_n_tpu.ops.relative_attention import (
    XLNetAttentionConfig,
    rel_shift_bnij,
    xlnet_rel_attn_core_n,
)
from flash_attention_softmax_n_tpu.surgery import apply_attention_softmax_n

QLEN, KLEN, BSZ, NH, DH = 6, 6, 2, 4, 8


@pytest.fixture(scope="module")
def hf_attn():
    torch.manual_seed(0)
    cfg = transformers.XLNetConfig(
        d_model=NH * DH, n_head=NH, d_inner=64, n_layer=1)
    module = transformers.models.xlnet.modeling_xlnet.XLNetRelativeAttention(
        cfg)
    for p in module.parameters():
        torch.nn.init.normal_(p, std=0.1)
    module.eval()
    return module


@pytest.fixture(scope="module")
def inputs():
    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.5

    q = t(QLEN, BSZ, NH, DH)
    k = t(KLEN, BSZ, NH, DH)
    v = t(KLEN, BSZ, NH, DH)
    # position encodings span 2*klen (bidirectional attn_type='bi')
    kr = t(2 * KLEN, BSZ, NH, DH)
    seg_mat = torch.nn.functional.one_hot(
        torch.randint(0, 2, (QLEN, KLEN, BSZ), generator=g), 2).float()
    attn_mask = (torch.rand(QLEN, KLEN, BSZ, 1, generator=g) < 0.15).float()
    return q, k, v, kr, seg_mat, attn_mask


def _ours(hf_attn, q, k, v, kr, seg_mat, attn_mask, n):
    j = lambda t: jnp.asarray(t.detach().numpy()) if t is not None else None
    return xlnet_rel_attn_core_n(
        j(q), j(k), j(v), j(kr),
        r_w_bias=j(hf_attn.r_w_bias), r_r_bias=j(hf_attn.r_r_bias),
        r_s_bias=j(hf_attn.r_s_bias), seg_embed=j(hf_attn.seg_embed),
        seg_mat=j(seg_mat), attn_mask=j(attn_mask),
        scale=float(hf_attn.scale), softmax_n_param=n)


class TestParityWithHF:
    def test_rel_shift_matches_hf(self):
        x = torch.randn(2, 3, 5, 10)
        expected = transformers.models.xlnet.modeling_xlnet.\
            XLNetRelativeAttention.rel_shift_bnij(x, klen=5).numpy()
        ours = rel_shift_bnij(jnp.asarray(x.numpy()), klen=5)
        np.testing.assert_allclose(ours, expected, atol=1e-6)

    def test_core_matches_hf_at_n0(self, hf_attn, inputs):
        q, k, v, kr, seg_mat, attn_mask = inputs
        with torch.no_grad():
            expected = hf_attn.rel_attn_core(
                q, k, v, kr, seg_mat=seg_mat, attn_mask=attn_mask).numpy()
        ours = _ours(hf_attn, q, k, v, kr, seg_mat, attn_mask, 0.0)
        np.testing.assert_allclose(ours, expected, atol=2e-5)

    def test_core_matches_hf_no_mask_no_seg(self, hf_attn, inputs):
        q, k, v, kr, _, _ = inputs
        with torch.no_grad():
            expected = hf_attn.rel_attn_core(q, k, v, kr).numpy()
        j = lambda t: jnp.asarray(t.detach().numpy())
        ours = xlnet_rel_attn_core_n(
            j(q), j(k), j(v), j(kr),
            r_w_bias=j(hf_attn.r_w_bias), r_r_bias=j(hf_attn.r_r_bias),
            scale=float(hf_attn.scale), softmax_n_param=0.0)
        np.testing.assert_allclose(ours, expected, atol=2e-5)

    def test_n1_changes_output(self, hf_attn, inputs):
        q, k, v, kr, seg_mat, attn_mask = inputs
        o0 = _ours(hf_attn, q, k, v, kr, seg_mat, attn_mask, 0.0)
        o1 = _ours(hf_attn, q, k, v, kr, seg_mat, attn_mask, 1.0)
        assert not bool(jnp.allclose(o0, o1))

    def test_negative_n_rejected(self, hf_attn, inputs):
        q, k, v, kr, seg_mat, attn_mask = inputs
        with pytest.raises(ValueError):
            _ours(hf_attn, q, k, v, kr, seg_mat, attn_mask, -1.0)


class TestXLNetSurgery:
    def test_converter_registered(self):
        cfg = XLNetAttentionConfig()
        new_cfg, _ = apply_attention_softmax_n((cfg, {}), 1.0)
        assert new_cfg.softmax_n == 1.0

    def test_model_type_string(self):
        # a config exposing model_type='xlnet' resolves via the string key
        import dataclasses

        @dataclasses.dataclass
        class SomeXLNetConfig:
            softmax_n: float = 0.0
            model_type: str = "xlnet"

        new_cfg, _ = apply_attention_softmax_n((SomeXLNetConfig(), {}), 2.0)
        assert new_cfg.softmax_n == 2.0
