from .cnn import ConvStack, ConvStageSpec
from .blstm import BLSTMStack, lstm_layer
from .cnnlstm import CnnLstmOcr, ModelConfig

__all__ = [
    "ConvStack",
    "ConvStageSpec",
    "BLSTMStack",
    "lstm_layer",
    "CnnLstmOcr",
    "ModelConfig",
]
