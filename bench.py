"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: fused AR vocoder decode throughput (samples/s/chip at 16 kHz,
reference-size network: GRU 896, 256-way mu-law head). ``vs_baseline`` is
measured against the north-star real-time-factor target RTF=0.05/chip
(= 320,000 samples/s; BASELINE.md) — > 1.0 beats the target.

Extras report the other BASELINE.md axes: CPC encoder training steps/s at
the reference batch shape (8 spk x 8 utt x 80 x 140; reference P100 runs
15.5 it/s -> ``cpc_vs_p100``), batched encoder frames/s, int8 vs bf16
decode, and the lax.scan decode for the kernel speedup.

Designed for the tunneled single-chip environment: one process, a D2H
warm-up first (the first device fetch can stall for minutes), every
section exception-guarded so one failure doesn't lose the line.
"""

import json
import time
import traceback

import numpy as np


def _bench(fn, n_rep=3, min_of=False):
    """Mean of a pipelined run (default) or min of per-rep timings.

    ``min_of`` suits long single dispatches (AR decode ~1 s): the tunneled
    device shows multi-10% run-to-run noise, and min is the standard robust
    estimator. Short steps keep the pipelined mean so per-dispatch tunnel
    latency isn't billed to every step.
    """
    import jax

    jax.block_until_ready(fn(0))  # compile
    if min_of:
        best = float("inf")
        for i in range(n_rep):
            t0 = time.time()
            jax.block_until_ready(fn(i + 1))
            best = min(best, time.time() - t0)
        return best
    t0 = time.time()
    for i in range(n_rep):
        out = fn(i + 1)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_rep


# Per-chip peak (dense) throughput for MFU accounting. v5e: 197 bf16
# TFLOP/s, 394 int8 TOP/s (public TPU v5e spec). MFU extras are emitted
# only when the device matches; other backends skip them rather than
# report against the wrong peak.
_PEAK_FLOPS = {"TPU v5 lite": {"bf16": 197e12, "int8": 394e12}}


def _decode_step_flops(net) -> float:
    """MXU FLOPs per decode step per stream (fused AR kernel, model math).

    One-hot embedding-row gather (runs as a real MXU matmul), recurrent
    GRU matmul, FC head. Frame-rate conditioning projection is excluded:
    amortized over upsampling_t samples it is <0.1% of the per-step work.
    """
    rn = net.rnnms
    h = rn.wave_ar.size_h_rnn
    fc = rn.wave_ar.size_h_fc
    classes = 2 ** rn.bits_mu_law
    return 2.0 * (classes * 3 * h + h * 3 * h + h * fc + fc * classes)


def _encoder_fwd_flops(enc, b: int, t_in: int) -> float:
    """Forward FLOPs of the encoder (conv + SegFC + VQ + LSTM, model math)."""
    t = t_in // 2
    ch, z, c = enc.channels, enc.z_dim, enc.c_dim
    conv = 2.0 * enc.in_channels * 4 * ch * t * b
    segfc = (4 * 2.0 * ch * ch + 2.0 * ch * z) * t * b
    vq = 2.0 * b * t * enc.n_embeddings * z
    lstm = 2.0 * (z + c) * 4 * c * t * b
    return conv + segfc + vq + lstm


def _cpc_fwd_flops(conf) -> float:
    """Forward FLOPs of one CPC train batch (reference shape, model math)."""
    enc = conf.model.encoder
    tc = conf.training.cpc
    b = tc.n_speakers_per_batch * tc.n_utterances_per_speaker
    t_in = conf.data.dataset.cpc.clip_length_mel
    t = t_in // 2
    preds = (tc.n_prediction_steps // 2) * 2.0 * enc.c_dim * enc.z_dim * t * b
    return _encoder_fwd_flops(enc, b, t_in) + preds


def _vocoder_fwd_flops(conf, batch: int, t_samples: int) -> float:
    """Forward FLOPs of one teacher-forced vocoder batch (model math).

    Counts the REFERENCE formulation's FLOPs, including the sample-rate
    input projection that the frame-rate restructure (models/vocoder.py)
    no longer executes — i.e. vocoder_train_mfu is "model FLOPs per
    second vs peak" (the standard convention for algorithmic savings,
    like not counting masked-out attention), not device utilization.
    """
    net = conf.training_vocoder.model.network
    rn = net.rnnms
    h = rn.wave_ar.size_h_rnn
    fc = rn.wave_ar.size_h_fc
    classes = 2 ** rn.bits_mu_law
    v = rn.dim_voc_latent
    embed = rn.wave_ar.size_i_embed_ar
    per_sample = 2.0 * ((embed + v) * 3 * h + h * 3 * h + h * fc + fc * classes)
    t_frames = t_samples // rn.upsampling_t
    half = v // 2
    prenet = (
        2  # directions
        * rn.prenet.num_layers
        * 2.0 * (rn.dim_i_feature + half) * 3 * half
        * t_frames
    )
    return batch * (per_sample * t_samples + prenet * 1.0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vectorquantizedcpc_tpu.configs import load_conf

    result = {
        "metric": "vocoder_samples_per_s_per_chip",
        "value": 0.0,
        "unit": "samples/s",
        "vs_baseline": 0.0,
        "device": str(jax.devices()[0].device_kind),
        "backend": jax.default_backend(),
    }
    errors = []

    # D2H warm-up (tunneled backend: first fetch can stall for minutes).
    t0 = time.time()
    _ = jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    result["d2h_warmup_s"] = round(time.time() - t0, 1)

    conf = load_conf([])  # full reference dimensions
    sr = conf.sampling_rate
    rng = np.random.default_rng(0)

    # ---- Compiled-kernel parity gate (VERDICT r4 #1). --------------------
    # Every kernel parity test in tests/ runs interpret-mode on CPU; a
    # Mosaic miscompile would pass the whole suite while corrupting
    # training. Before timing anything, assert each COMPILED Pallas kernel
    # against its XLA reference on this chip and record the result, so
    # every BENCH_r*.json doubles as a correctness certificate.
    if jax.default_backend() == "tpu":
        parity_ok = True
        try:
            import jax.numpy as jnp  # noqa: F811 (section-local clarity)

            # (a) CPC selection kernel, fwd + VJP, vs the exact-f32 XLA
            # path at the reference shape (both exact => tight tolerance).
            from vectorquantizedcpc_tpu.models.cpc import (
                cpc_apply_with_indices,
                cpc_init,
                sample_negative_indices,
            )

            cconf = conf.model.cpc
            k_steps = cconf.n_prediction_steps // 2
            s_, u_ = cconf.n_speakers_per_batch, cconf.n_utterances_per_speaker
            length = conf.training.cpc.sample_frames // 2
            t_lat = length + k_steps
            z_ = jnp.asarray(
                rng.normal(size=(s_ * u_, t_lat, conf.model.encoder.z_dim))
                .astype(np.float32)
            )
            c_ = jnp.asarray(
                rng.normal(size=(s_ * u_, t_lat, conf.model.encoder.c_dim))
                .astype(np.float32)
            )
            cpc_params = cpc_init(jax.random.key(7), cconf)
            ui, si = sample_negative_indices(cconf, jax.random.key(8), length)

            def sel_all(p, kernel):
                return cpc_apply_with_indices(
                    p, cconf, z_, c_, ui, si, select_kernel=kernel
                )

            def sel_loss(p, kernel):
                return sel_all(p, kernel)[0]

            l_x, g_x = jax.jit(
                jax.value_and_grad(lambda p: sel_loss(p, False))
            )(cpc_params)
            l_k, g_k = jax.jit(
                jax.value_and_grad(lambda p: sel_loss(p, True))
            )(cpc_params)
            acc_x = np.asarray(jax.jit(lambda p: sel_all(p, False)[1])(cpc_params))
            acc_k = np.asarray(jax.jit(lambda p: sel_all(p, True)[1])(cpc_params))
            sel_loss_err = abs(float(l_k) - float(l_x)) / max(
                abs(float(l_x)), 1e-9
            )
            sel_grad_err = 0.0
            for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_k)):
                a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
                scale = max(np.abs(a).max(), 1e-6)
                sel_grad_err = max(
                    sel_grad_err, float(np.abs(a - b).max() / scale)
                )
            sel_acc_err = float(np.abs(acc_k - acc_x).max())
            result["parity_select_loss_rel"] = round(sel_loss_err, 8)
            result["parity_select_grad_rel"] = round(sel_grad_err, 7)
            result["parity_select_acc_abs"] = round(sel_acc_err, 5)
            # Thresholds: loss at f32-reduction noise; grads at MXU
            # single-pass (bf16-level) noise — the kernel's f32 Mosaic
            # dots run one bf16 pass on hardware, by measured choice
            # (Precision.HIGHEST costs 962 -> 842 steps/s; see
            # ops/cpc_select.py precision note) and bf16 training
            # tolerates it in every other matmul too; accuracies at the
            # f32 tie-break recompute's second-order residual. A real
            # Mosaic miscompile (wrong selection, broken VJP) shows up
            # orders of magnitude above all three.
            ok = (
                sel_loss_err < 1e-4
                and sel_grad_err < 2e-2
                and sel_acc_err < 2e-2
            )
            result["kernel_parity_select_ok"] = bool(ok)
            parity_ok &= ok

            # (b) Fused LSTM fwd+bwd vs the lax.scan path (bf16 compute on
            # both sides -> bf16 tolerance), CPC context-net shape.
            from vectorquantizedcpc_tpu.models.rnn import (
                lstm_apply,
                lstm_init,
            )

            lp = lstm_init(jax.random.key(9), 64, 256)
            lx = jnp.asarray(
                rng.normal(size=(64, 70, 64)).astype(np.float32) * 0.5
            ).astype(jnp.bfloat16)

            def lstm_loss(p, pallas):
                o, _ = lstm_apply(p, lx, use_pallas=pallas)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            lstm_err = 0.0
            o_s, _ = jax.jit(lambda p: lstm_apply(p, lx))(lp)
            o_k, _ = jax.jit(
                lambda p: lstm_apply(p, lx, use_pallas=True)
            )(lp)
            lstm_err = float(
                np.abs(
                    np.asarray(o_k, np.float32) - np.asarray(o_s, np.float32)
                ).max()
            )
            gl_s = jax.jit(jax.grad(lambda p: lstm_loss(p, False)))(lp)
            gl_k = jax.jit(jax.grad(lambda p: lstm_loss(p, True)))(lp)
            lstm_gerr = 0.0
            for a, b in zip(jax.tree.leaves(gl_s), jax.tree.leaves(gl_k)):
                a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
                scale = max(np.abs(a).max(), 1e-6)
                lstm_gerr = max(lstm_gerr, float(np.abs(a - b).max() / scale))
            result["parity_lstm_fwd_abs"] = round(lstm_err, 5)
            result["parity_lstm_grad_rel"] = round(lstm_gerr, 5)
            ok = lstm_err < 3e-2 and lstm_gerr < 3e-2
            result["kernel_parity_lstm_ok"] = bool(ok)
            parity_ok &= ok

            # (c) Fused GRU train kernel fwd+bwd vs the custom-VJP scan
            # (bf16), vocoder AR shape with a shortened sequence.
            from vectorquantizedcpc_tpu.models.rnn import gru_init, gru_scan
            from vectorquantizedcpc_tpu.ops.gru_train import fused_gru_scan

            gp = gru_init(jax.random.key(10), 512, 896)
            gxp = jnp.asarray(
                rng.normal(size=(640, 32, 3 * 896)).astype(np.float32) * 0.3
            ).astype(jnp.bfloat16)
            gh0 = jnp.zeros((32, 896), jnp.bfloat16)
            gwh = gp.wh.astype(jnp.bfloat16)
            gbh = gp.bh.astype(jnp.bfloat16)

            hs_s = jax.jit(gru_scan)(gwh, gbh, gxp, gh0)
            hs_k = jax.jit(
                lambda w, b_, xp, h: fused_gru_scan(w, b_, xp, h, False)
            )(gwh, gbh, gxp, gh0)
            gru_err = float(
                np.abs(
                    np.asarray(hs_k, np.float32) - np.asarray(hs_s, np.float32)
                ).max()
            )
            gg_s = jax.jit(
                jax.grad(
                    lambda w, b_, xp: jnp.sum(
                        jnp.sin(gru_scan(w, b_, xp, gh0).astype(jnp.float32))
                    ),
                    argnums=(0, 1, 2),
                )
            )(gwh, gbh, gxp)
            gg_k = jax.jit(
                jax.grad(
                    lambda w, b_, xp: jnp.sum(
                        jnp.sin(
                            fused_gru_scan(w, b_, xp, gh0, False).astype(
                                jnp.float32
                            )
                        )
                    ),
                    argnums=(0, 1, 2),
                )
            )(gwh, gbh, gxp)
            gru_gerr = 0.0
            for a, b in zip(gg_s, gg_k):
                a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
                scale = max(np.abs(a).max(), 1e-6)
                gru_gerr = max(gru_gerr, float(np.abs(a - b).max() / scale))
            result["parity_gru_fwd_abs"] = round(gru_err, 5)
            result["parity_gru_grad_rel"] = round(gru_gerr, 5)
            ok = gru_err < 5e-2 and gru_gerr < 5e-2
            result["kernel_parity_gru_ok"] = bool(ok)
            parity_ok &= ok

            # (d) AR decode kernel, greedy, vs vocoder_generate: the
            # compiled bf16 kernel must match the f32 scan class-for-class
            # up to the first bf16 near-tie of the reference logits (the
            # same prefix-parity check tests/test_ar_decode.py pins in
            # interpret mode).
            from vectorquantizedcpc_tpu.models.vocoder import (
                vocoder_generate,
                vocoder_init,
            )
            from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

            net_p = conf.training_vocoder.model.network
            vparams = vocoder_init(jax.random.key(11), net_p)
            zc = jnp.asarray(
                rng.integers(0, net_p.size_i_codebook, size=(4, 25))
            )
            spkc = jnp.asarray(rng.integers(0, net_p.n_speakers, size=(4,)))
            ref_w, ref_cls, ref_logits = vocoder_generate(
                vparams, net_p, zc, spkc, jax.random.key(12), greedy=True,
                return_aux=True,
            )
            fused_w = fused_ar_decode(
                vparams, net_p, zc, spkc, jax.random.key(12), greedy=True
            )
            # Recover classes from the decoded wave (mulaw_decode is
            # injective: nearest table entry == the emitted class).
            from vectorquantizedcpc_tpu.dsp.mulaw import mulaw_decode

            table = np.asarray(mulaw_decode(np.arange(256), 256), np.float32)
            fused_cls = np.argmin(
                np.abs(np.asarray(fused_w, np.float32)[..., None] - table),
                axis=-1,
            )
            ref_cls = np.asarray(ref_cls)
            agree = np.asarray(fused_cls) == ref_cls
            ok = True
            min_div = None
            lg = np.asarray(ref_logits, np.float32)
            for bi in range(agree.shape[0]):
                if agree[bi].all():
                    continue
                t0 = int(np.argmin(agree[bi]))
                min_div = t0 if min_div is None else min(min_div, t0)
                gap = float(
                    lg[bi, t0].max() - lg[bi, t0, int(fused_cls[bi, t0])]
                )
                if gap > 0.1:  # divergence NOT at a near-tie: real bug
                    ok = False
            result["parity_ar_agree_frac"] = round(float(agree.mean()), 4)
            if min_div is not None:
                result["parity_ar_first_divergence"] = min_div
            result["kernel_parity_ar_ok"] = bool(ok)
            parity_ok &= ok

            result["kernel_parity_ok"] = bool(parity_ok)
        except Exception:
            result["kernel_parity_ok"] = False
            errors.append("kernel_parity: " + traceback.format_exc(limit=3))

    # ---- Fused AR vocoder decode (headline). -----------------------------
    try:
        from vectorquantizedcpc_tpu.models.vocoder import vocoder_init
        from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

        net = conf.training_vocoder.model.network
        params = vocoder_init(jax.random.key(0), net)
        seconds = 2.0
        n_frames = int(seconds * sr) // net.rnnms.upsampling_t // 2
        t_decode = n_frames * 2 * net.rnnms.upsampling_t

        # The AR decode is latency-bound at small batch: per-step time is
        # nearly flat in batch (sweep_decode.py), so batch 8 is the
        # per-stream latency point and batch 32-128 the throughput points.
        # INT8 weight-only quantization cannot beat bf16 at the latency
        # point (the step is MXU-latency-bound, not throughput-bound; the
        # matmuls it accelerates are not the critical path) — its win is at
        # b>=64 where the MXU saturates, which is what the pairs below
        # demonstrate. Headline = best samples/s among configs still
        # meeting the RTF<0.05 per-stream target. All timings min-of-N
        # (pinned methodology: the tunneled chip shows multi-10% run-to-run
        # noise; relative claims are within-run).
        candidates = []
        for batch, precision in (
            (8, "bf16"), (8, "int8"), (32, "bf16"), (32, "int8"),
            (48, "bf16"), (48, "int8"), (64, "bf16"), (64, "int8"),
            (128, "bf16"), (128, "int8"),
        ):
            # Per-config guard: one failing point (e.g. an OOM at a large
            # batch) must not lose the headline or the other points.
            try:
                z = jnp.asarray(
                    rng.integers(0, net.size_i_codebook, size=(batch, n_frames))
                )
                spk = jnp.asarray(
                    rng.integers(0, net.n_speakers, size=(batch,))
                )
                decode = jax.jit(
                    lambda key, p=precision, z=z, s=spk: fused_ar_decode(
                        params, net, z, s, key, precision=p
                    )
                )

                # 3 pipelined decodes per rep, one block: charging the
                # ~25 ms tunneled sync RTT to every 2-s decode would
                # inflate RTF by ~0.012 (r3 numbers did; a real TPU host's
                # sync is microseconds).
                def run3(i, d=decode):
                    for j in range(3):
                        out = d(jax.random.key(3 * i + j))
                    return out

                dt = _bench(run3, n_rep=3, min_of=True) / 3
            except Exception:
                errors.append(
                    f"decode[b{batch},{precision}]: "
                    + traceback.format_exc(limit=2)
                )
                continue
            tag = f"decode_{precision}" + (f"_b{batch}" if batch != 8 else "")
            rtf = dt / (t_decode / sr)
            sps = batch * t_decode / dt
            result[f"{tag}_rtf"] = round(rtf, 5)
            result[f"{tag}_samples_per_s"] = round(sps)
            result[f"{tag}_us_per_step"] = round(dt * 1e6 / t_decode, 2)
            peak = _PEAK_FLOPS.get(result["device"], {}).get(precision)
            if peak:
                result[f"{tag}_mfu"] = round(
                    batch * _decode_step_flops(net) / (dt / t_decode) / peak,
                    3,
                )
            candidates.append((rtf, sps))

        ok = [sps for rtf, sps in candidates if rtf <= 0.05]
        best = max(ok) if ok else max(sps for _, sps in candidates)
        result["value"] = round(float(best))
        result["vs_baseline"] = round(best / (sr / 0.05), 3)
        result["batch"] = 8
        # Within-run int8-vs-bf16 speedups (>1 = int8 faster).
        for b in (8, 32, 64, 128):
            bf = result.get(f"decode_bf16_b{b}_us_per_step") if b != 8 \
                else result.get("decode_bf16_us_per_step")
            i8 = result.get(f"decode_int8_b{b}_us_per_step") if b != 8 \
                else result.get("decode_int8_us_per_step")
            if bf and i8:
                result[f"int8_speedup_b{b}"] = round(bf / i8, 3)

        # Persist the measured step-time table so resolve_precision("auto")
        # decides from THIS hardware's capture instead of a hardcoded
        # table (VERDICT r4 #5; ops/ar_decode.py:load_measured_step_us).
        try:
            import os

            capture = {"device": result["device"]}
            for mode in ("bf16", "int8"):
                rows = []
                for b in (8, 32, 48, 64, 128):
                    key = (
                        f"decode_{mode}_us_per_step" if b == 8
                        else f"decode_{mode}_b{b}_us_per_step"
                    )
                    if key in result:
                        rows.append([b, result[key]])
                capture[mode] = rows
            if all(len(capture[m]) >= 2 for m in ("bf16", "int8")):
                path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_STEP_US.json",
                )
                with open(path, "w") as f:
                    json.dump(capture, f)
                result["step_us_capture_written"] = True
        except Exception:
            errors.append("step_us_capture: " + traceback.format_exc(limit=2))
    except Exception:
        errors.append("decode: " + traceback.format_exc(limit=2))

    # ---- lax.scan decode (kernel speedup reference). ---------------------
    try:
        from vectorquantizedcpc_tpu.models.vocoder import vocoder_generate

        z8 = jnp.asarray(
            rng.integers(0, net.size_i_codebook, size=(8, n_frames))
        )
        spk8 = jnp.asarray(rng.integers(0, net.n_speakers, size=(8,)))
        dt_scan = _bench(
            lambda i: vocoder_generate(params, net, z8, spk8, jax.random.key(i)),
            n_rep=1,
        )
        result["decode_scan_rtf"] = round(dt_scan / (t_decode / sr), 4)
        if "decode_bf16_rtf" in result:
            result["kernel_speedup_vs_scan"] = round(
                dt_scan / (result["decode_bf16_rtf"] * (t_decode / sr)), 1
            )
    except Exception:
        errors.append("scan: " + traceback.format_exc(limit=2))

    # ---- Continuous-batching serving throughput (mixed lengths). ---------
    try:
        from vectorquantizedcpc_tpu.infer.serving import ContinuousBatcher

        hop = net.rnnms.upsampling_t
        buckets = [25, 50, 100]
        # segment_frames=4: finest retirement quantization wastes the
        # least decode on each stream's final partial segment, and the
        # segment kernel has NO launch overhead down to sf=4
        # (benchmarks/dissect_drain2.py: 1.98 us/step at sf=4 vs 1.99
        # monolithic — r4 measurement superseding the r3 sf=8 sweep).
        server = ContinuousBatcher(
            params, net, slots=32, segment_frames=4,
            max_frames=2 * max(buckets) + 32,
        )
        reqs = [
            (
                rng.integers(
                    0, net.size_i_codebook, size=(int(rng.choice(buckets)),)
                ),
                int(rng.integers(0, net.n_speakers)),
            )
            for _ in range(48)
        ]
        valid = sum(2 * len(z_) * hop for z_, _ in reqs)

        # Analytic slot-utilization ceiling for a request mix: LPT
        # segments over the slot pool (the server's own admission policy);
        # valid frames / (makespan x sf x slots). Measured ratios read
        # against this, not against 1.0 — the longest stream pins the
        # makespan and tail slots idle. Parameters are the SERVER's
        # (slots/segment_frames above), not constants.
        import heapq

        _sf, _slots = server._segment_frames, len(server._slot_meta)

        def mix_ceiling(reqs_):
            heap = [0] * _slots
            for seg in sorted(
                (-(-2 * len(z_) // _sf) for z_, _ in reqs_), reverse=True
            ):
                heapq.heappush(heap, heapq.heappop(heap) + seg)
            return sum(2 * len(z_) for z_, _ in reqs_) / (
                max(heap) * _sf * _slots
            )

        result["serving_mix_utilization_ceiling"] = round(mix_ceiling(reqs), 3)
        # min-of-N; rep 0 warms every compiled program on the planned-drain
        # path (per-bucket conditioning, per-chunk-size drain programs).
        # Two boundaries, pinned methodology: "to device" (every stream's
        # classes computed — the SAME boundary the raw decode kernel
        # numbers use, so serving_vs_b32_kernel is apples-to-apples) and
        # "to host" (results as numpy; additionally pays the host-link D2H,
        # ~16 MB/s on this tunneled dev chip vs GB/s on a real TPU host).
        best_dev, best_host = float("inf"), float("inf")
        for rep in range(3):
            for z_, s_ in reqs:
                server.submit(z_, s_)
            t0 = time.time()
            server.run(materialize=False)
            dt_dev = time.time() - t0
            for z_rid in list(server._pending):
                server.result(z_rid)
            dt_host = time.time() - t0
            if rep > 0:
                best_dev = min(best_dev, dt_dev)
                best_host = min(best_host, dt_host)
        result["serving_samples_per_s"] = round(valid / best_dev)
        result["serving_to_host_samples_per_s"] = round(valid / best_host)
        result["serving_streams"] = len(reqs)
        result["serving_vs_b32_kernel"] = round(
            valid / best_dev
            / max(result.get("decode_bf16_b32_samples_per_s", 1), 1),
            3,
        )

        # In-process RTT-amortized ratio (VERDICT r3 #1): one blocked sync
        # on this tunneled link costs ~25 ms — comparable to an entire
        # drain — so the per-rep-blocked numbers above under-report BOTH
        # sides by a link-dependent amount. Here 3 drains (and 3 raw b32
        # kernel decodes) are enqueued back-to-back with ONE final sync
        # each, in the same capture, so the ratio reflects device work
        # only and tunnel drift can't masquerade as a serving regression.
        from vectorquantizedcpc_tpu.ops.ar_decode import fused_ar_decode

        # MEDIAN over >= 5 paired in-process measurements (VERDICT r4 #4:
        # a single best-of-capture number hid 0.74-0.90 run-to-run spread
        # and made the residual host orchestration untrackable). Each
        # measurement pipelines n_pipe serving drains with one final sync,
        # then n_pipe raw b32 kernel decodes the same way, so each ratio
        # is within-capture and tunnel drift cancels.
        n_pipe = 5
        z32 = jnp.asarray(
            rng.integers(0, net.size_i_codebook, size=(32, n_frames))
        )
        spk32 = jnp.asarray(rng.integers(0, net.n_speakers, size=(32,)))
        decode32 = jax.jit(
            lambda key: fused_ar_decode(params, net, z32, spk32, key)
        )
        jax.block_until_ready(decode32(jax.random.key(0)))

        def _one_serving_measurement():
            t0 = time.time()
            for rep in range(n_pipe):
                for z_, s_ in reqs:
                    server.submit(z_, s_)
                server.run(materialize=False, wait=(rep == n_pipe - 1))
                server._pending.clear()
                server._results.clear()
            return n_pipe * valid / (time.time() - t0)

        def _one_kernel_measurement():
            t0 = time.time()
            for i in range(n_pipe):
                out32 = decode32(jax.random.key(i + 1))
            jax.block_until_ready(out32)
            return n_pipe * 32 * t_decode / (time.time() - t0)

        _one_serving_measurement()  # warm the drain path end-to-end
        serv_rates, kern_rates, ratios = [], [], []
        for _ in range(5):
            sr_ = _one_serving_measurement()
            kr_ = _one_kernel_measurement()
            serv_rates.append(sr_)
            kern_rates.append(kr_)
            ratios.append(sr_ / kr_)
        ratios_sorted = sorted(ratios)
        med = ratios_sorted[len(ratios_sorted) // 2]
        result["serving_pipelined_samples_per_s"] = round(
            sorted(serv_rates)[len(serv_rates) // 2]
        )
        result["decode_bf16_b32_pipelined_samples_per_s"] = round(
            sorted(kern_rates)[len(kern_rates) // 2]
        )
        result["serving_vs_b32_kernel_inproc"] = round(med, 3)
        result["serving_vs_b32_kernel_inproc_min"] = round(ratios_sorted[0], 3)
        result["serving_vs_b32_kernel_inproc_max"] = round(ratios_sorted[-1], 3)
        result["serving_inproc_measurements"] = [round(r, 3) for r in ratios]

        # CONTINUOUS boundary: all 5 reps' worth of requests queued up
        # front — the production serving pattern (admission refills freed
        # slots mid-flight), which removes the inter-drain slot tails the
        # 48-request drain pays every rep. Its utilization ceiling is
        # correspondingly higher; both the measurement and the ceiling
        # are recorded so the ratio reads against the right bound.
        reqs240 = reqs * 5
        valid240 = 5 * valid
        result["serving_continuous_utilization_ceiling"] = round(
            mix_ceiling(reqs240), 3
        )

        def _one_continuous_measurement():
            for z_, s_ in reqs240:
                server.submit(z_, s_)
            t0 = time.time()
            server.run(materialize=False)
            dt = time.time() - t0
            server._pending.clear()
            server._results.clear()
            return valid240 / dt

        # PAIRED with a fresh kernel measurement per capture (the same
        # within-capture discipline as the inproc block above — reusing
        # kern_rates from the earlier window would let link drift between
        # the windows masquerade as a serving change).
        _one_continuous_measurement()  # warm the 240-request drain shapes
        cont_ratios, cont_abs = [], []
        for _ in range(5):
            cr = _one_continuous_measurement()
            kr = _one_kernel_measurement()
            cont_abs.append(cr)
            cont_ratios.append(cr / kr)
        cont_sorted = sorted(cont_ratios)
        result["serving_continuous_samples_per_s"] = round(
            sorted(cont_abs)[len(cont_abs) // 2]
        )
        result["serving_continuous_vs_b32_kernel"] = round(
            cont_sorted[len(cont_sorted) // 2], 3
        )
        result["serving_continuous_measurements"] = [
            round(r, 3) for r in cont_ratios
        ]

        # int8 serving point: 64 slots is at int8's measured crossover
        # (int8_speedup_b64 > 1), so "auto" resolves to int8 there; a bf16
        # run of the SAME 96-request workload gives the within-run ratio.
        reqs96 = [
            (
                rng.integers(
                    0, net.size_i_codebook, size=(int(rng.choice(buckets)),)
                ),
                int(rng.integers(0, net.n_speakers)),
            )
            for _ in range(96)
        ]
        valid96 = sum(2 * len(z_) * hop for z_, _ in reqs96)
        for prec_tag, prec in (("int8", "auto"), ("bf16", "bf16")):
            server64 = ContinuousBatcher(
                params, net, slots=64, segment_frames=4,
                max_frames=2 * max(buckets) + 32, precision=prec,
            )
            if prec_tag == "int8" and server64._precision != "int8":
                errors.append("serving: auto did not resolve to int8 at 64")
            best64 = float("inf")
            for rep in range(3):
                for z_, s_ in reqs96:
                    server64.submit(z_, s_)
                t0 = time.time()
                server64.run(materialize=False)
                if rep > 0:
                    best64 = min(best64, time.time() - t0)
                server64._pending.clear()
                server64._results.clear()
            result[f"serving_b64_{prec_tag}_samples_per_s"] = round(
                valid96 / best64
            )
        if result.get("serving_b64_bf16_samples_per_s"):
            result["serving_int8_vs_bf16_b64"] = round(
                result["serving_b64_int8_samples_per_s"]
                / result["serving_b64_bf16_samples_per_s"],
                3,
            )
    except Exception:
        errors.append("serving: " + traceback.format_exc(limit=2))

    # ---- CPC training step at reference shape. ---------------------------
    try:
        from vectorquantizedcpc_tpu.training.cpc import init_train_state

        state = init_train_state(conf, jax.random.key(0))
        tc = conf.training.cpc
        # Measure the SHIPPED hot loop — the whole-epoch scan (one dispatch
        # per epoch, training/cpc.py:make_train_epoch). Timing single
        # dispatched steps instead reads ~12 ms/step of tunnel dispatch
        # latency on top of ~0.5 ms/step of device compute.
        from vectorquantizedcpc_tpu.training.cpc import (
            make_train_epoch,
            make_train_epochs,
        )

        n_batches = 50  # steps per epoch
        epoch_mels = jnp.asarray(
            rng.normal(
                size=(
                    n_batches,
                    tc.n_speakers_per_batch,
                    tc.n_utterances_per_speaker,
                    80,
                    conf.data.dataset.cpc.clip_length_mel,
                )
            ).astype(np.float32)
        )
        train_epoch = make_train_epoch(conf)
        holder = {"state": state}

        epochs_per_rep = 3

        def run(i):
            # Pipeline several epoch dispatches per rep, block once: the
            # shipped loop runs epochs back-to-back and fetches metrics
            # every log_interval=10 epochs (training/cpc.py), so charging
            # one ~25 ms tunnel sync RTT to every epoch (xprof: the
            # 50-step epoch is 83.5 ms ON DEVICE vs ~109 ms blocked-wall)
            # would under-report the shipped throughput by ~25%.
            for _ in range(epochs_per_rep):
                holder["state"], metrics = train_epoch(
                    holder["state"], epoch_mels, np.float32(4e-4)
                )
            return metrics["loss"]

        # min-of-N (pinned methodology, VERDICT r1 weak #5): min discards
        # tunnel-noise outliers.
        dt = _bench(run, n_rep=5, min_of=True) / (n_batches * epochs_per_rep)
        result["cpc_train_e1_steps_per_s"] = round(1.0 / dt, 1)

        # Grouped dispatch (training.cpc.epochs_per_dispatch=5): the r4
        # decomposition found ~177 us/step of per-dispatch host/link
        # overhead that does not overlap device compute (0.858 ms/step on
        # device vs 1.035 wall); folding 5 epochs into one dispatch
        # divides it by 5 (VERDICT r4 #3). This is the shipped trainer
        # path (train_model groups the producer + LR vector identically),
        # so it is the primary reported number.
        e_group = 5
        group_mels = jnp.asarray(
            np.broadcast_to(
                np.asarray(epoch_mels)[None], (e_group,) + epoch_mels.shape
            ).copy()
        )
        lrs = jnp.full((e_group,), 4e-4, jnp.float32)
        train_epochs = make_train_epochs(conf)
        gholder = {"state": init_train_state(conf, jax.random.key(1))}

        def run_grouped(n_disp):
            for _ in range(n_disp):
                gholder["state"], metrics = train_epochs(
                    gholder["state"], group_mels, lrs
                )
            return metrics["loss"]

        # Primary number: 2 grouped dispatches per sync = 500 steps — the
        # SHIPPED fetch boundary (train_model fetches metrics every
        # log_interval=10 epochs x 50 steps). The r4 wall-vs-device gap
        # decomposes as wall = device (~874 us/step incl. dispatch) +
        # syncRTT / steps_per_sync (~27 ms on this tunneled link, us on a
        # real TPU host): measured 980/926/901 us/step at 250/500/1000
        # steps per sync. The 1000-step point is also recorded: any user
        # raising log_interval (or on a non-tunneled host) sees it.
        # Sync via a scalar FETCH (not block_until_ready: on the axon
        # backend block_until_ready was observed returning early for
        # large buffers) — which is also exactly what the shipped metric
        # fetch does.
        _ = float(jnp.sum(run_grouped(1)))  # compile + sync
        best = {250: float("inf"), 500: float("inf"), 1000: float("inf")}
        for n_disp, steps in ((1, 250), (2, 500), (4, 1000)):
            for _ in range(4):
                t0 = time.time()
                _ = float(jnp.sum(run_grouped(n_disp)))
                best[steps] = min(best[steps], time.time() - t0)
        dt_g = best[500] / 500
        dt = min(dt, dt_g)
        result["cpc_train_steps_per_s"] = round(1.0 / dt, 1)
        result["cpc_train_e5_steps_per_s"] = round(500 / best[500], 1)
        result["cpc_train_250step_sync_steps_per_s"] = round(
            250 / best[250], 1
        )
        result["cpc_train_1000step_sync_steps_per_s"] = round(
            1000 / best[1000], 1
        )
        result["cpc_train_steps_per_dispatch"] = n_batches * e_group
        result["cpc_train_epochs_per_dispatch"] = e_group
        result["cpc_vs_p100"] = round(1.0 / dt / 15.5, 2)  # README.md:106
        peak = _PEAK_FLOPS.get(result["device"], {}).get("bf16")
        if peak:
            # Train step ~ 3x forward (fwd + 2x in backward), the standard
            # analytic-FLOPs convention.
            result["cpc_train_mfu"] = round(
                3 * _cpc_fwd_flops(conf) / dt / peak, 3
            )
    except Exception:
        errors.append("cpc: " + traceback.format_exc(limit=2))

    # ---- Vocoder training step at reference shape. ------------------------
    # Reference: 0.84 it/s on a Colab GPU at batch 32 x 5,120 samples
    # (README.md:107, config.py:101,116-117).
    try:
        from vectorquantizedcpc_tpu.models.encoder import encoder_init
        from vectorquantizedcpc_tpu.training import vocoder as voc_train

        enc_params_v, vq_state_v = encoder_init(
            jax.random.key(3), conf.model.encoder
        )
        vstate = voc_train.init_train_state(conf, jax.random.key(4))
        # The shipped grouped-dispatch path (train_vocoder with
        # trainer.steps_per_dispatch): K steps per lax.scan dispatch,
        # removing the ~2.7 ms/dispatch host/link overhead the per-step
        # path pays (xprof r5).
        k_steps_pd = 10
        vmulti = voc_train.make_train_multi_step(conf)
        vb = conf.data.loader.batch_size  # 32
        clip = conf.data.dataset.clip_length_mel  # 32
        hop = conf.data.dataset.mel_stft_stride  # 160
        vaudio = jnp.asarray(
            rng.integers(
                0, 256, size=(k_steps_pd, vb, clip * hop + 1)
            ).astype(np.int32)
        )
        vmels = jnp.asarray(
            rng.normal(size=(k_steps_pd, vb, 80, clip)).astype(np.float32)
        )
        vspk = jnp.asarray(
            rng.integers(
                0, conf.training_vocoder.model.n_speakers,
                size=(k_steps_pd, vb),
            ).astype(np.int32)
        )
        vlrs = jnp.full((k_steps_pd,), 4e-4, jnp.float32)
        vholder = {"state": vstate}

        def vrun(i):
            # One rep = one K-step dispatch, timed min-of-N across reps
            # (pinned methodology, VERDICT r2 weak #8).
            vholder["state"], vmetrics = vmulti(
                vholder["state"], enc_params_v, vq_state_v,
                vaudio, vmels, vspk, vlrs,
            )
            return vmetrics["loss"]

        dt = _bench(vrun, n_rep=4, min_of=True) / k_steps_pd
        result["vocoder_train_steps_per_s"] = round(1.0 / dt, 2)
        result["vocoder_train_vs_ref_gpu"] = round(1.0 / dt / 0.84, 1)
        peak = _PEAK_FLOPS.get(result["device"], {}).get("bf16")
        if peak:
            result["vocoder_train_mfu"] = round(
                3 * _vocoder_fwd_flops(conf, vb, clip * hop) / dt / peak, 3
            )
    except Exception:
        errors.append("vocoder_train: " + traceback.format_exc(limit=2))

    # ---- Batched encoder inference frames/s. -----------------------------
    try:
        from vectorquantizedcpc_tpu.models.encoder import (
            encoder_encode,
            encoder_init,
        )

        enc_params, vq_state = encoder_init(jax.random.key(0), conf.model.encoder)
        b, t = 64, 1024
        use_pallas = jax.default_backend() == "tpu"
        mels_inf = jnp.asarray(rng.normal(size=(b, 80, t)).astype(np.float32))
        enc_fn = jax.jit(
            lambda m: encoder_encode(
                enc_params, vq_state, m, jnp.bfloat16, use_pallas=use_pallas
            )[2]
        )
        # Plenty of reps: a single call is ~ms-scale, so per-dispatch tunnel
        # latency dominates small-n means (observed 2x run-to-run swings).
        dt = _bench(lambda i: enc_fn(mels_inf), n_rep=30)
        result["encoder_frames_per_s_single_call"] = round(b * t / dt)
        # Steady-state corpus-encoding throughput: this backend charges
        # ~1 ms of launch overhead PER PROGRAM (measured: standalone
        # component timings sum to ~2x the fused whole;
        # benchmarks/profile_encoder_infer.py) — which at ~2 ms of real
        # compute/call makes the single-call number mostly launch
        # overhead, and is why BENCH_r02/r03 swung 42M->25M without a code
        # cause. A 4-batch lax.scan in one program amortizes it; this is
        # the realistic boundary for offline corpus encoding (many batches
        # back-to-back) and the primary reported number.
        # 16 batches per program: at 4 the ~1 ms per-program launch charge
        # was still ~50% of the measured time (xprof r5: 0.73 ms/batch on
        # device vs 1.45 ms/batch benched at n_scan=4).
        n_scan = 16
        mels_scan = jnp.asarray(
            rng.normal(size=(n_scan, b, 80, t)).astype(np.float32)
        )
        enc_scan = jax.jit(
            lambda ms: jax.lax.scan(
                lambda _c, m: (
                    0,
                    encoder_encode(
                        enc_params, vq_state, m, jnp.bfloat16,
                        use_pallas=use_pallas,
                    )[2],
                ),
                0,
                ms,
            )[1]
        )
        dt_scan = _bench(lambda i: enc_scan(mels_scan), n_rep=8) / n_scan
        result["encoder_frames_per_s"] = round(b * t / dt_scan)
        peak = _PEAK_FLOPS.get(result["device"], {}).get("bf16")
        if peak:
            result["encoder_mfu"] = round(
                _encoder_fwd_flops(conf.model.encoder, b, t) / dt_scan / peak,
                3,
            )
    except Exception:
        errors.append("encoder: " + traceback.format_exc(limit=2))

    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
