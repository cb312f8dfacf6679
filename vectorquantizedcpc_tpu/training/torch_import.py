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
    # Must COPY: tensor.numpy() is a view of torch storage, and JAX's CPU
    # backend zero-copies aligned host buffers on device_put — without the
    # copy, imported params would alias live torch tensors and mutate under
    # us if the torch model keeps training (caught by the lockstep parity
    # test, tests/test_reference_parity.py).
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t, copy=True)


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


# ---------------------------------------------------------------------------
# Vocoder (reference network_vocoder.py Vocoder wrapping rnnms.RNNMSVocoder,
# the external tarepan/UniversalVocoding dependency — reference
# pyproject.toml:19, config contract config.py:63-77).
# ---------------------------------------------------------------------------


def _find_gru_groups(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Group torch nn.GRU tensors by module prefix.

    torch GRUs serialize as ``<prefix>.weight_ih_l{k}[_reverse]`` etc.; the
    exact module attribute names inside the external rnnms package are not
    part of the reference snapshot, so the importer locates modules
    STRUCTURALLY (GRU key patterns, Embedding = weight without bias, Linear
    shapes) instead of hardcoding a guessed attribute path.
    """
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        name = k.rsplit(".", 1)[-1]
        if name.startswith(("weight_ih_l", "weight_hh_l", "bias_ih_l", "bias_hh_l")):
            prefix = k.rsplit(".", 1)[0]
            groups.setdefault(prefix, {})[name] = v
    return groups


def _gru_layer(g: Dict[str, np.ndarray], layer: int, reverse: bool):
    from ..models.rnn import GRUParams
    import jax.numpy as jnp  # noqa: F811 (kept local for clarity)

    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    return GRUParams(
        wx=jnp.asarray(g[f"weight_ih_{sfx}"].T),
        wh=jnp.asarray(g[f"weight_hh_{sfx}"].T),
        bx=jnp.asarray(g[f"bias_ih_{sfx}"]),
        bh=jnp.asarray(g[f"bias_hh_{sfx}"]),
    )


def import_vocoder(state_dict: Dict[str, Any]) -> "VocoderParams":
    """Map a reference ``Vocoder`` state_dict -> VocoderParams.

    Handles the wrapper's own embeddings by their exact reference names
    (network_vocoder.py:37-38) and the rnnms internals structurally:

    - PreNet = the bidirectional multi-layer GRU (keys with ``_reverse``
      twins; reference config contract prenet.num_layers/bidirectional,
      config.py:71-73). torch packs all layers into one nn.GRU module;
      our stacked per-layer/per-direction GRUParams split it apart.
    - AR GRU = the unidirectional single-layer GRU (wave_ar.size_h_rnn,
      config.py:74-77).
    - AR sample embedding = the 2-D ``.weight`` with no ``.bias`` sibling
      (nn.Embedding) outside the wrapper embeddings.
    - fc1/fc2 = the two Linears, ordered by matching fc1's input dim to
      the AR GRU hidden size.
    """
    from ..models.vocoder import VocoderParams

    sd = {k: _np(v) for k, v in state_dict.items()}

    code_emb = sd.pop("code_embedding.weight")
    spk_emb = sd.pop("speaker_embedding.weight")

    gru_groups = _find_gru_groups(sd)
    prenet_group = None
    ar_group = None
    for prefix, g in gru_groups.items():
        if any(k.endswith("_reverse") for k in g):
            prenet_group = (prefix, g)
        else:
            ar_group = (prefix, g)
    if prenet_group is None or ar_group is None:
        raise ValueError(
            "could not locate PreNet (bidirectional) and AR GRU modules in "
            f"the vocoder state_dict; GRU prefixes found: {list(gru_groups)}"
        )
    gru_keys = {
        f"{p}.{n}" for p, g in (prenet_group, ar_group) for n in g
    }

    n_prenet_layers = 1 + max(
        int(k.split("_l")[-1].replace("_reverse", ""))
        for k in prenet_group[1]
    )
    prenet_fwd = tuple(
        _gru_layer(prenet_group[1], i, False) for i in range(n_prenet_layers)
    )
    prenet_bwd = tuple(
        _gru_layer(prenet_group[1], i, True) for i in range(n_prenet_layers)
    )
    ar_gru = _gru_layer(ar_group[1], 0, False)
    hidden = int(ar_gru.wh.shape[0])

    # Remaining tensors: one Embedding (weight, no bias) + two Linears.
    rest = {k: v for k, v in sd.items() if k not in gru_keys}
    weights = {k for k in rest if k.endswith(".weight")}
    linears, embed_key = [], None
    for k in sorted(weights):
        bias_key = k[: -len(".weight")] + ".bias"
        if bias_key in rest:
            linears.append((k, bias_key))
        elif rest[k].ndim == 2:
            if embed_key is not None:
                raise ValueError(
                    f"ambiguous AR embedding: {embed_key} vs {k}"
                )
            embed_key = k
    if embed_key is None or len(linears) != 2:
        raise ValueError(
            "expected 1 embedding + 2 linear layers in the AR head, found "
            f"embedding={embed_key} linears={[k for k, _ in linears]}"
        )
    # fc1 consumes the GRU hidden state; fc2 is the mu-law class head.
    (fc1_w, fc1_b), (fc2_w, fc2_b) = sorted(
        linears, key=lambda kb: rest[kb[0]].shape[1] != hidden
    )
    if rest[fc1_w].shape[1] != hidden:
        raise ValueError(
            f"no Linear with input dim {hidden} (AR GRU hidden) found"
        )

    return VocoderParams(
        code_embedding=jnp.asarray(code_emb),
        speaker_embedding=jnp.asarray(spk_emb),
        prenet_fwd=prenet_fwd,
        prenet_bwd=prenet_bwd,
        ar_embed=jnp.asarray(rest[embed_key]),
        ar_gru=ar_gru,
        fc1_w=jnp.asarray(rest[fc1_w].T),
        fc1_b=jnp.asarray(rest[fc1_b]),
        fc2_w=jnp.asarray(rest[fc2_w].T),
        fc2_b=jnp.asarray(rest[fc2_b]),
    )


def load_reference_vocoder_checkpoint(
    path: Union[str, Path]
) -> "VocoderParams":
    """One-call import of a reference vocoder checkpoint.

    Accepts all three on-disk formats the reference ecosystem produces:
    a raw ``Vocoder`` state_dict, the legacy bshall ``{"vocoder": ...}``
    dict (expected by reference convert.py:45), and a PyTorch-Lightning
    ``last.ckpt`` (reference train_vocoder.py:66-71) whose ``state_dict``
    prefixes the vocoder with ``model.`` and embeds the frozen encoder
    under ``encoder.`` (reference vocoder.py:47-48 — stripped here).
    """
    ckpt = load_torch_checkpoint(path)
    if "vocoder" in ckpt:
        sd = ckpt["vocoder"]
    elif "state_dict" in ckpt:
        sd = {
            k[len("model."):]: v
            for k, v in ckpt["state_dict"].items()
            if k.startswith("model.")
        }
    else:
        sd = ckpt
    return import_vocoder(sd)
