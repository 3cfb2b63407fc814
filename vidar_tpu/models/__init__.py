from .layers import (FFN, LearnedPositionalEncoding, MLP,
                     torch_linear_kernel_init, torch_linear_bias_init,
                     xavier_uniform_init)
from .attention import (TemporalSelfAttention, SpatialCrossAttention,
                        MSDeformableAttention3D, PredictionMSDeformableAttention)
from .latent_rendering import LatentRendering
from .encoder import BEVFormerEncoder
from .transformer import PerceptionTransformer
from .vidar_decoder import PredictionDecoder
from .vidar_head import ViDARHead
from .resnet import ResNet
from .fpn import FPN
from .vidar import ViDAR
