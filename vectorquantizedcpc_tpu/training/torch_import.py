"""PyTorch -> JAX weight importer for reference checkpoints.

Loads the reference's ``model.ckpt-{epoch}.pt`` dicts (saved by reference
train_cpc.py:17-33 with keys {encoder, cpc, optimizer, scheduler, epoch})
and maps the torch state-dicts onto our parameter pytrees, so pretrained
reference encoders can be evaluated (ABX / voice conversion) without
retraining — SURVEY.md §5.4 "checkpoint parity".

Layout conversions:
- Conv1d weight OIW (out, in, k) -> our WIO (k, in, out).
- Linear weight (out, in) -> our (in, out).
- LSTM: torch keeps separate b_ih/b_hh which are always summed -> one bias;
  gate order (i, f, g, o) is preserved as-is (models/rnn.py uses torch
  order by construction).
- The reference Encoder's Sequential ``encoder`` indices: 0=LN, 1=ReLU,
  then 4 x [Linear, LN, ReLU] at (2+3i, 3+3i), final Linear at index 14
  (reference model.py:46-55).

torch is only imported inside the loader so the framework itself never
depends on it.
"""

from pathlib import Path
from typing import Any, Dict, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..models.cpc import CPCParams
from ..models.encoder import EncoderParams
from ..models.rnn import LSTMParams
from ..models.vq import VQEMAState


def load_torch_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=True)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def import_encoder(
    state_dict: Dict[str, Any]
) -> Tuple[EncoderParams, VQEMAState]:
    """Map the reference Encoder state_dict -> (EncoderParams, VQEMAState)."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    # Sequential weights: 1 input LN + (Linear + LN) per block + 1 output
    # Linear -> blocks = (n_weight_keys - 2) / 2.
    n_weight_keys = sum(
        1 for k in sd if k.startswith("encoder.") and k.endswith(".weight")
    )
    n_blocks = (n_weight_keys - 2) // 2
    fc_w = np.stack([sd[f"encoder.{2 + 3 * i}.weight"].T for i in range(n_blocks)])
    fc_ln_scale = np.stack([sd[f"encoder.{3 + 3 * i}.weight"] for i in range(n_blocks)])
    fc_ln_bias = np.stack([sd[f"encoder.{3 + 3 * i}.bias"] for i in range(n_blocks)])
    out_idx = 2 + 3 * n_blocks

    params = EncoderParams(
        conv_w=jnp.asarray(np.transpose(sd["conv.weight"], (2, 1, 0))),
        ln_in_scale=jnp.asarray(sd["encoder.0.weight"]),
        ln_in_bias=jnp.asarray(sd["encoder.0.bias"]),
        fc_w=jnp.asarray(fc_w),
        fc_ln_scale=jnp.asarray(fc_ln_scale),
        fc_ln_bias=jnp.asarray(fc_ln_bias),
        out_w=jnp.asarray(sd[f"encoder.{out_idx}.weight"].T),
        out_b=jnp.asarray(sd[f"encoder.{out_idx}.bias"]),
        rnn=LSTMParams(
            wx=jnp.asarray(sd["rnn.weight_ih_l0"].T),
            wh=jnp.asarray(sd["rnn.weight_hh_l0"].T),
            b=jnp.asarray(sd["rnn.bias_ih_l0"] + sd["rnn.bias_hh_l0"]),
        ),
    )
    vq_state = VQEMAState(
        embedding=jnp.asarray(sd["codebook.embedding"]),
        ema_count=jnp.asarray(sd["codebook.ema_count"]),
        ema_weight=jnp.asarray(sd["codebook.ema_weight"]),
    )
    return params, vq_state


def import_cpc(state_dict: Dict[str, Any]) -> CPCParams:
    """Map the reference CPCLoss state_dict (12 Linear predictors)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    prefix = "predictors." if any(k.startswith("predictors.") for k in sd) else ""
    n = sum(1 for k in sd if k.endswith(".weight"))
    w = np.stack([sd[f"{prefix}{k}.weight"].T for k in range(n)])
    b = np.stack([sd[f"{prefix}{k}.bias"] for k in range(n)])
    return CPCParams(w=jnp.asarray(w), b=jnp.asarray(b))


def load_reference_cpc_checkpoint(
    path: Union[str, Path]
) -> Tuple[EncoderParams, VQEMAState, CPCParams, int]:
    """One-call import of a full reference CPC checkpoint file."""
    ckpt = load_torch_checkpoint(path)
    enc, vq = import_encoder(ckpt["encoder"])
    cpc = import_cpc(ckpt["cpc"]) if "cpc" in ckpt else None
    epoch = int(ckpt.get("epoch", 0))
    return enc, vq, cpc, epoch
