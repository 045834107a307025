from iinsvae_tpu.models.layers import (
    Conv1d,
    Conv2d,
    ConvINAct,
    Dense,
    MLP,
    ResidualBlock1d,
    ResidualBlock2d,
    BatchNormEps,
)
from iinsvae_tpu.models.encoders import (
    RangeEncoder1d, RangeEncoder2d, RangeEncoder2dNoExpand,
    EnvEncoder1d, EnvEncoder2d, EnvEncoder2dNoExpand, Encoder,
)
from iinsvae_tpu.models.decoders import Decoder1d, Decoder2d, Decoder2dNoExpand, Decoder
from iinsvae_tpu.models.heads import (
    RestorerLinear,
    RestorerConv1d,
    RestorerConv2d,
    RestorerConv2dNoExpand,
    ClassifierLinear,
    ClassifierConv1d,
    ClassifierConv2d,
    Restorer,
    Classifier,
)
from iinsvae_tpu.models.emnet import EMNet, EMNetLoop, IdentifierSep, RegressorSep
from iinsvae_tpu.models.vae import IInsVAE

__all__ = [
    "Conv1d", "Conv2d", "ConvINAct", "Dense", "MLP", "ResidualBlock1d", "ResidualBlock2d", "BatchNormEps",
    "RangeEncoder1d", "RangeEncoder2d", "RangeEncoder2dNoExpand",
    "EnvEncoder1d", "EnvEncoder2d", "EnvEncoder2dNoExpand", "Encoder",
    "Decoder1d", "Decoder2d", "Decoder2dNoExpand", "Decoder",
    "RestorerLinear", "RestorerConv1d", "RestorerConv2d", "RestorerConv2dNoExpand",
    "ClassifierLinear", "ClassifierConv1d", "ClassifierConv2d",
    "Restorer", "Classifier",
    "EMNet", "EMNetLoop", "IdentifierSep", "RegressorSep",
    "IInsVAE",
]
