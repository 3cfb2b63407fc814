from .layers import (FFN, LearnedPositionalEncoding, MLP,
                     torch_linear_kernel_init, torch_linear_bias_init,
                     xavier_uniform_init)
from .attention import (TemporalSelfAttention, SpatialCrossAttention,
                        MSDeformableAttention3D,
                        PredictionMSDeformableAttention)
from .latent_rendering import LatentRendering
from .encoder import BEVFormerEncoder, point_sampling
from .transformer import PerceptionTransformer, BEVEncoderHead
from .vidar_decoder import PredictionDecoder, PredictionTransformerLayer
from .vidar_head import ViDARHead
from .resnet import ResNet
from .fpn import FPN
from .vidar import ViDAR
from .bevformer import BEVFormer, StreamState
from .detection import BEVFormerHead
from .bevformer import BEVFormerFP16
from .bevformer_v2 import BEVFormerV2, ResNetFusion
from .bev_head import BEVHead, Anchor3DHead
from .internimage import InternImage
from .vovnet import VoVNet
from .attention import GroupMultiheadAttention
from .dd3d import (NuScenesDD3D, FCOS2DHead, FCOS3DHead,
                   boxes3d_corners, predictions_to_boxes3d)
