"""PyTorch checkpoint importer: full-model forward parity.

Builds the reference Encoder architecture in torch (Conv1d k4s2p1 no-bias ->
LN -> ReLU -> [Linear -> LN -> ReLU] x4 -> Linear -> VQ codebook buffers ->
LSTM; reference model.py:33-57), saves a checkpoint shaped exactly like the
reference's (train_cpc.py:17-33), imports it, and checks that OUR encode
path reproduces the torch forward bit-close — the guarantee that pretrained
reference checkpoints give identical ABX inputs without retraining.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorquantizedcpc_tpu.models.encoder import encoder_encode
from vectorquantizedcpc_tpu.training.torch_import import (
    import_cpc,
    import_encoder,
    load_reference_cpc_checkpoint,
)

torch = pytest.importorskip("torch")
nn = torch.nn

IN_CH, CH, M, ZD, CD = 8, 16, 12, 4, 6


def _build_torch_encoder():
    """Reference-architecture encoder with reference state_dict key names."""
    torch.manual_seed(0)

    class TorchEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv1d(IN_CH, CH, 4, 2, 1, bias=False)
            layers = [nn.LayerNorm(CH), nn.ReLU(True)]
            for _ in range(4):
                layers += [nn.Linear(CH, CH, bias=False), nn.LayerNorm(CH), nn.ReLU(True)]
            layers += [nn.Linear(CH, ZD)]
            self.encoder = nn.Sequential(*layers)
            self.register_buffer("placeholder", torch.zeros(1))
            self.rnn = nn.LSTM(ZD, CD, batch_first=True)

        def forward(self, mel):
            z = self.conv(mel)
            z = self.encoder(z.transpose(1, 2))
            return z  # pre-VQ latents

    enc = TorchEncoder()
    # VQ codebook buffers under the reference's "codebook." prefix.
    embedding = torch.randn(M, ZD) * 0.3
    state = enc.state_dict()
    state.pop("placeholder")
    state["codebook.embedding"] = embedding
    state["codebook.ema_count"] = torch.rand(M) + 0.5
    state["codebook.ema_weight"] = embedding * 1.05
    return enc, state


def test_encoder_import_forward_parity(rng):
    enc_torch, state_dict = _build_torch_encoder()
    params, vq_state = import_encoder(state_dict)

    mel = rng.normal(size=(2, IN_CH, 30)).astype(np.float32)
    with torch.no_grad():
        z_pre_ref = enc_torch(torch.from_numpy(mel)).numpy()
        # Reference encode: argmin lookup + LSTM over quantized z.
        flat = torch.from_numpy(z_pre_ref.reshape(-1, ZD))
        e = state_dict["codebook.embedding"]
        d = (e.pow(2).sum(1)[None] + flat.pow(2).sum(1, keepdim=True)
             - 2 * flat @ e.t())
        idx_ref = d.argmin(-1).numpy().reshape(2, 15)

    z, c, indices, z_pre = encoder_encode(
        params, vq_state, jnp.asarray(mel), return_pre_vq=True
    )
    np.testing.assert_allclose(np.asarray(z_pre), z_pre_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(indices), idx_ref)

    # Context net parity: run the torch LSTM over the quantized latents.
    q_ref = torch.nn.functional.embedding(
        torch.from_numpy(idx_ref), e
    )
    with torch.no_grad():
        c_ref, _ = enc_torch.rnn(q_ref)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=1e-5)


def test_cpc_import(rng):
    torch.manual_seed(1)
    preds = nn.ModuleList([nn.Linear(CD, ZD) for _ in range(12)])
    state = {f"predictors.{k}.weight": preds[k].weight for k in range(12)}
    state.update({f"predictors.{k}.bias": preds[k].bias for k in range(12)})
    params = import_cpc({k: v.detach() for k, v in state.items()})
    assert params.w.shape == (12, CD, ZD)

    c = rng.normal(size=(3, CD)).astype(np.float32)
    for k in [0, 5, 11]:
        with torch.no_grad():
            ref = preds[k](torch.from_numpy(c)).numpy()
        ours = c @ np.asarray(params.w[k]) + np.asarray(params.b[k])
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_full_checkpoint_roundtrip(tmp_path, rng):
    """A reference-format .pt file loads end to end."""
    enc_torch, state_dict = _build_torch_encoder()
    preds = nn.ModuleList([nn.Linear(CD, ZD) for _ in range(12)])
    ckpt = {
        "encoder": state_dict,
        "cpc": preds.state_dict(),
        "optimizer": {},
        "scheduler": {},
        "epoch": 22000,
    }
    path = tmp_path / "model.ckpt-22000.pt"
    torch.save(ckpt, path)

    enc, vq, cpc, epoch = load_reference_cpc_checkpoint(path)
    assert epoch == 22000
    assert enc.fc_w.shape == (4, CH, CH)
    assert vq.embedding.shape == (M, ZD)
    assert cpc.w.shape == (12, CD, ZD)
