"""Encoder tests: conv parity vs torch, shapes, encode/forward consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.configs import ConfEncoder
from vectorquantizedcpc_tpu.models.encoder import (
    _frontend,
    encoder_encode,
    encoder_forward,
    encoder_init,
)

torch = pytest.importorskip("torch")

CONF = ConfEncoder(in_channels=8, channels=16, n_embeddings=12, z_dim=4, c_dim=6)
CONF_FULL = ConfEncoder(
    in_channels=80, channels=512, n_embeddings=512, z_dim=64, c_dim=256
)


def test_conv_matches_torch(rng):
    """Our NWC/WIO strided conv == torch Conv1d(k=4, s=2, p=1, bias=False)."""
    torch.manual_seed(0)
    tc = torch.nn.Conv1d(8, 16, 4, 2, 1, bias=False)
    w_torch = tc.weight.detach().numpy()  # (out, in, k) OIW

    x = rng.normal(size=(2, 8, 20)).astype(np.float32)  # (B, C, T)
    with torch.no_grad():
        ref = tc(torch.from_numpy(x)).numpy()  # (B, out, T/2)

    w_ours = jnp.asarray(np.transpose(w_torch, (2, 1, 0)))  # OIW -> WIO
    x_nwc = jnp.asarray(np.swapaxes(x, 1, 2))
    out = jax.lax.conv_general_dilated(
        x_nwc, w_ours, (2,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), ref, atol=1e-5
    )


def test_frontend_halves_time(rng):
    params, _ = encoder_init(jax.random.key(0), CONF)
    mels = jnp.asarray(rng.normal(size=(3, 8, 20)).astype(np.float32))
    z_pre = _frontend(params, mels, jnp.float32)
    assert z_pre.shape == (3, 10, 4)


def test_segfc_matches_torch_stack(rng):
    """Full frontend vs a torch transcription of Conv-LN-ReLU-[FC-LN-ReLU]x4-FC."""
    params, _ = encoder_init(jax.random.key(1), CONF)

    conv = torch.nn.Conv1d(8, 16, 4, 2, 1, bias=False)
    conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(params.conv_w), (2, 1, 0)).copy()
    )
    ln_in = torch.nn.LayerNorm(16)
    ln_in.weight.data = torch.from_numpy(np.asarray(params.ln_in_scale).copy())
    ln_in.bias.data = torch.from_numpy(np.asarray(params.ln_in_bias).copy())
    fcs, lns = [], []
    for i in range(4):
        fc = torch.nn.Linear(16, 16, bias=False)
        fc.weight.data = torch.from_numpy(np.asarray(params.fc_w[i]).T.copy())
        ln = torch.nn.LayerNorm(16)
        ln.weight.data = torch.from_numpy(np.asarray(params.fc_ln_scale[i]).copy())
        ln.bias.data = torch.from_numpy(np.asarray(params.fc_ln_bias[i]).copy())
        fcs.append(fc)
        lns.append(ln)
    out_fc = torch.nn.Linear(16, 4)
    out_fc.weight.data = torch.from_numpy(np.asarray(params.out_w).T.copy())
    out_fc.bias.data = torch.from_numpy(np.asarray(params.out_b).copy())

    x = rng.normal(size=(2, 8, 20)).astype(np.float32)
    with torch.no_grad():
        h = conv(torch.from_numpy(x)).transpose(1, 2)
        h = torch.relu(ln_in(h))
        for fc, ln in zip(fcs, lns):
            h = torch.relu(ln(fc(h)))
        ref = out_fc(h).numpy()

    ours = _frontend(params, jnp.asarray(x), jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_encode_shapes_and_types(rng):
    params, vq_state = encoder_init(jax.random.key(2), CONF)
    mel = jnp.asarray(rng.normal(size=(2, 8, 30)).astype(np.float32))
    z, c, indices = encoder_encode(params, vq_state, mel)
    assert z.shape == (2, 15, 4)
    assert c.shape == (2, 15, 6)
    assert indices.shape == (2, 15)
    assert indices.dtype == jnp.int32
    assert int(indices.max()) < 12


def test_forward_returns_updated_state(rng):
    params, vq_state = encoder_init(jax.random.key(3), CONF)
    mels = jnp.asarray(rng.normal(size=(4, 8, 30)).astype(np.float32))
    z, c, new_state, vq_loss, ppl = encoder_forward(params, vq_state, mels)
    assert z.shape == (4, 15, 4)
    assert c.shape == (4, 15, 6)
    assert float(vq_loss) >= 0
    assert 1.0 <= float(ppl) <= 12.0
    # EMA state moved.
    assert not np.allclose(
        np.asarray(new_state.ema_count), np.asarray(vq_state.ema_count)
    )


def test_encode_agrees_with_forward_quantization(rng):
    """Same input -> encode() and forward() pick identical code indices."""
    params, vq_state = encoder_init(jax.random.key(4), CONF)
    mels = jnp.asarray(rng.normal(size=(2, 8, 30)).astype(np.float32))
    z_e, _, indices = encoder_encode(params, vq_state, mels)
    z_f, _, _, _, _ = encoder_forward(params, vq_state, mels)
    # Straight-through forward value equals the quantized vectors.
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_e), atol=1e-5)


def test_full_size_shapes(rng):
    """Reference dimensions: (64, 80, 140) mel -> (64, 70, 64) z, (64, 70, 256) c."""
    params, vq_state = encoder_init(jax.random.key(5), CONF_FULL)
    mels = jnp.asarray(rng.normal(size=(2, 80, 140)).astype(np.float32))
    z, c, indices = encoder_encode(params, vq_state, mels)
    assert z.shape == (2, 70, 64)
    assert c.shape == (2, 70, 256)
    assert params.fc_w.shape == (4, 512, 512)


def test_bfloat16_compute_close_to_f32(rng):
    params, vq_state = encoder_init(jax.random.key(6), CONF)
    mels = jnp.asarray(rng.normal(size=(2, 8, 30)).astype(np.float32))
    z32, _, idx32 = encoder_encode(params, vq_state, mels)
    z16, _, idx16 = encoder_encode(
        params, vq_state, mels, compute_dtype=jnp.bfloat16
    )
    # Indices mostly agree; quantized outputs are codebook rows (f32 exact).
    agreement = np.mean(np.asarray(idx32) == np.asarray(idx16))
    assert agreement > 0.9


@pytest.mark.parametrize("t", [300, 301])
def test_conv_strategy_paths_agree(rng, monkeypatch, t):
    """The unfold+matmul conv and XLA's native NWC conv (selected by input
    length, models/encoder.py:_UNFOLD_MAX_T) compute the same frontend —
    including the exact odd-T contract (T' = floor(T/2), true final sample
    in-window)."""
    import vectorquantizedcpc_tpu.models.encoder as enc_mod

    params, _ = encoder_init(jax.random.key(0), CONF)
    mels = jnp.asarray(rng.normal(size=(2, 8, t)).astype(np.float32))

    monkeypatch.setattr(enc_mod, "_UNFOLD_MAX_T", 10**9)
    out_unfold = enc_mod._frontend(params, mels, jnp.float32)
    monkeypatch.setattr(enc_mod, "_UNFOLD_MAX_T", 0)
    out_conv = enc_mod._frontend(params, mels, jnp.float32)

    assert out_unfold.shape == out_conv.shape == (2, t // 2, 4)
    np.testing.assert_allclose(
        np.asarray(out_unfold), np.asarray(out_conv), atol=2e-5
    )
