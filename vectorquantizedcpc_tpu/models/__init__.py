"""Model layer: Encoder, VQ-EMA codebook, CPC loss, RNN_MS vocoder.

TPU-native functional re-design of the reference's model.py /
network_vocoder.py. Parameters are immutable flax.struct pytrees; all
recurrence is lax.scan with input projections hoisted into single large
matmuls (MXU-friendly); the VQ-EMA codebook is explicit functional state
threaded through the train step (JAX has no mutable buffers).
"""

from .rnn import (
    LSTMParams,
    GRUParams,
    lstm_init,
    gru_init,
    lstm_apply,
    gru_apply,
    bigru_apply,
)
from .vq import VQEMAState, vq_init, vq_encode, vq_apply_train
from .encoder import EncoderParams, encoder_init, encoder_encode, encoder_forward
from .cpc import CPCParams, cpc_init, cpc_apply
from .vocoder import (
    VocoderParams,
    vocoder_init,
    vocoder_forward,
    vocoder_generate,
)

__all__ = [
    "LSTMParams",
    "GRUParams",
    "lstm_init",
    "gru_init",
    "lstm_apply",
    "gru_apply",
    "bigru_apply",
    "VQEMAState",
    "vq_init",
    "vq_encode",
    "vq_apply_train",
    "EncoderParams",
    "encoder_init",
    "encoder_encode",
    "encoder_forward",
    "CPCParams",
    "cpc_init",
    "cpc_apply",
    "VocoderParams",
    "vocoder_init",
    "vocoder_forward",
    "vocoder_generate",
]
