"""RNN cell parity tests against torch.nn.LSTM/GRU (CPU golden reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.models.rnn import (
    GRUParams,
    LSTMParams,
    bigru_apply,
    gru_apply,
    gru_init,
    lstm_apply,
    lstm_init,
)

torch = pytest.importorskip("torch")


def _torch_lstm_to_params(tl):
    return LSTMParams(
        wx=jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
        wh=jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
        b=jnp.asarray((tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy()),
    )


def _torch_gru_to_params(tg, suffix="l0"):
    return GRUParams(
        wx=jnp.asarray(getattr(tg, f"weight_ih_{suffix}").detach().numpy().T),
        wh=jnp.asarray(getattr(tg, f"weight_hh_{suffix}").detach().numpy().T),
        bx=jnp.asarray(getattr(tg, f"bias_ih_{suffix}").detach().numpy()),
        bh=jnp.asarray(getattr(tg, f"bias_hh_{suffix}").detach().numpy()),
    )


def test_lstm_matches_torch(rng):
    torch.manual_seed(0)
    tl = torch.nn.LSTM(16, 32, batch_first=True)
    params = _torch_lstm_to_params(tl)

    x = rng.normal(size=(3, 20, 16)).astype(np.float32)
    with torch.no_grad():
        ref, (h_ref, c_ref) = tl(torch.from_numpy(x))
    out, (h, c) = lstm_apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_ref[0].numpy(), atol=1e-5)


def test_gru_matches_torch(rng):
    torch.manual_seed(1)
    tg = torch.nn.GRU(12, 24, batch_first=True)
    params = _torch_gru_to_params(tg)

    x = rng.normal(size=(2, 15, 12)).astype(np.float32)
    with torch.no_grad():
        ref, h_ref = tg(torch.from_numpy(x))
    out, h = gru_apply(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].numpy(), atol=1e-5)


def test_bigru_matches_torch(rng):
    torch.manual_seed(2)
    tg = torch.nn.GRU(10, 14, batch_first=True, bidirectional=True)
    fwd = _torch_gru_to_params(tg, "l0")
    bwd = _torch_gru_to_params(tg, "l0_reverse")

    x = rng.normal(size=(2, 9, 10)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))
    out = bigru_apply(fwd, bwd, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_lstm_state_carryover_equals_full_run(rng):
    """Chunked scan with carried state == single full-length scan.

    This property underpins blockwise/streaming encode (SURVEY.md §5.7).
    """
    params = lstm_init(jax.random.key(0), 8, 16)
    x = jnp.asarray(rng.normal(size=(2, 30, 8)).astype(np.float32))
    full, _ = lstm_apply(params, x)
    out1, state = lstm_apply(params, x[:, :13])
    out2, _ = lstm_apply(params, x[:, 13:], state)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([out1, out2], axis=1)),
        np.asarray(full),
        atol=1e-6,
    )


def test_gru_init_shapes():
    p = gru_init(jax.random.key(0), 5, 7)
    assert p.wx.shape == (5, 21) and p.wh.shape == (7, 21)
    assert p.bx.shape == (21,) and p.bh.shape == (21,)


def test_rnn_jit_and_grad(rng):
    """Cells are differentiable and jittable (used inside the train step)."""
    params = lstm_init(jax.random.key(3), 4, 6)
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))

    @jax.jit
    def loss_fn(p, x):
        out, _ = lstm_apply(p, x)
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(params, x)
    assert g.wx.shape == params.wx.shape
    assert np.isfinite(np.asarray(g.wh)).all()
    assert float(jnp.abs(g.wx).sum()) > 0


def test_gru_scan_custom_vjp_matches_autodiff(rng):
    """gru_scan's hand-written backward == XLA autodiff of the same scan.

    The custom VJP restructures the weight gradient into one deep matmul
    (models/rnn.py:gru_scan); it must stay numerically equivalent.
    """
    from vectorquantizedcpc_tpu.models.rnn import gru_scan, gru_step

    T, B, H, D = 37, 4, 16, 8
    params = gru_init(jax.random.key(0), D, H)
    xproj = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    def ref_scan(wh, bh, xproj, h0):
        p = params.replace(wh=wh, bh=bh)
        _, hs = jax.lax.scan(
            lambda h, xp: (gru_step(p, h, xp),) * 2, h0, xproj
        )
        return hs

    out_ref = ref_scan(params.wh, params.bh, xproj, h0)
    out_new = gru_scan(params.wh, params.bh, xproj, h0)
    np.testing.assert_allclose(out_new, out_ref, rtol=1e-6, atol=1e-6)

    g_ref = jax.grad(
        lambda *a: jnp.sum(ref_scan(*a) * w), argnums=(0, 1, 2, 3)
    )(params.wh, params.bh, xproj, h0)
    g_new = jax.grad(
        lambda *a: jnp.sum(gru_scan(*a) * w), argnums=(0, 1, 2, 3)
    )(params.wh, params.bh, xproj, h0)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


def test_fused_lstm_scan_matches_scan(rng):
    """Pallas fused LSTM (interpret mode) vs the lax.scan path: forward and
    gradients agree to bf16 carry precision (the kernel carries h/c in f32,
    the bf16 scan in bf16 — both within bf16 noise of the exact result),
    and both stay within bf16 tolerance of the f32 scan ground truth."""
    from vectorquantizedcpc_tpu.ops.lstm_scan import fused_lstm_scan

    B, T, D, H = 4, 22, 8, 32  # T=22 -> chunk 11, exercises multi-chunk
    params = lstm_init(jax.random.key(0), D, H)
    x32 = rng.normal(size=(B, T, D)).astype(np.float32) * 0.5
    x = jnp.asarray(x32, jnp.bfloat16)

    out_scan, (h_s, c_s) = lstm_apply(params, x)
    out_pal, (h_p, c_p) = lstm_apply(params, x, use_pallas=True, interpret=True)
    out_f32, _ = lstm_apply(params, jnp.asarray(x32))
    assert out_pal.dtype == out_scan.dtype
    np.testing.assert_allclose(
        np.asarray(out_pal, np.float32), np.asarray(out_scan, np.float32),
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_pal, np.float32), np.asarray(out_f32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(h_p, np.float32), np.asarray(h_s, np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(c_p, np.float32), np.asarray(c_s, np.float32), atol=4e-2
    )

    def loss(p, pallas):
        o, _ = lstm_apply(p, x, use_pallas=pallas, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_scan = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for name in ("wx", "wh", "b"):
        a = np.asarray(getattr(g_scan, name), np.float32)
        b = np.asarray(getattr(g_pal, name), np.float32)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2)


def test_fused_lstm_f32_inputs_keep_scan_path():
    """use_pallas is honored only for bf16 compute; f32 callers (CPU /
    torch-golden parity) must get the bit-identical scan result."""
    params = lstm_init(jax.random.key(1), 8, 16)
    x = jnp.ones((2, 6, 8), jnp.float32)
    a, _ = lstm_apply(params, x)
    b, _ = lstm_apply(params, x, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_gru_scan_matches_scan(rng):
    """Pallas fused GRU train kernel (interpret mode) vs the custom-VJP
    scan (models/rnn.py:gru_scan): forward and all gradients (dwh, dbh,
    dxproj, dh0) agree to bf16 tolerance against the f32 scan ground
    truth. T=22 -> chunk 11? no: chunk picker caps at 8 -> chunk 2,
    exercising the multi-chunk path and the reversed backward grid."""
    from vectorquantizedcpc_tpu.models.rnn import gru_scan
    from vectorquantizedcpc_tpu.ops.gru_train import fused_gru_scan

    B, T, H = 4, 22, 32
    params = gru_init(jax.random.key(0), 8, H)
    xproj = jnp.asarray(
        rng.normal(size=(T, B, 3 * H)).astype(np.float32) * 0.5
    )
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)

    hs_ref = gru_scan(params.wh, params.bh, xproj, h0)
    hs_k = fused_gru_scan(params.wh, params.bh, xproj, h0, True)
    assert hs_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(hs_k, np.float32), np.asarray(hs_ref), atol=2e-2
    )

    def loss(wh, bh, xp, h, kernel):
        if kernel:
            hs = fused_gru_scan(wh, bh, xp, h, True).astype(jnp.float32)
        else:
            hs = gru_scan(wh, bh, xp, h)
        return jnp.sum(jnp.sin(hs))

    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params.wh, params.bh, xproj, h0, False
    )
    g_k = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params.wh, params.bh, xproj, h0, True
    )
    for name, a, b in zip(("dwh", "dbh", "dxproj", "dh0"), g_ref, g_k):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2,
                                   err_msg=name)


def test_vocoder_forward_pallas_matches_scan():
    """The full teacher-forced vocoder forward routed through the fused
    GRU kernel (interpret mode) matches the scan path at bf16 tolerance —
    pins the vocoder_forward wiring, not just the bare kernel."""
    from vectorquantizedcpc_tpu.configs import load_conf
    from vectorquantizedcpc_tpu.models.vocoder import (
        vocoder_forward,
        vocoder_init,
    )

    conf = load_conf([
        "training_vocoder.model.network.n_speakers=4",
        "training_vocoder.model.network.rnnms.wave_ar.size_h_rnn=24",
        "training_vocoder.model.network.rnnms.wave_ar.size_h_fc=16",
    ]).training_vocoder.model.network
    params = vocoder_init(jax.random.key(0), conf)
    rng = np.random.default_rng(5)
    b, frames = 2, 4
    t = frames * 2 * conf.rnnms.upsampling_t // 4  # short clip
    x = jnp.asarray(rng.integers(0, 256, size=(b, t)).astype(np.int32))
    z = jnp.asarray(
        rng.integers(0, conf.size_i_codebook, size=(b, frames)).astype(np.int32)
    )
    spk = jnp.asarray(rng.integers(0, 4, size=(b,)).astype(np.int32))

    logits_scan = vocoder_forward(params, conf, x, z, spk, jnp.bfloat16)
    logits_k = vocoder_forward(
        params, conf, x, z, spk, jnp.bfloat16,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_k), np.asarray(logits_scan), atol=8e-2
    )
