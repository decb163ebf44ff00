from ov3det.models.detr3d import Model3DETR, decode_boxes, last_layer_outputs
from ov3det.models.mlp import GenericMLP
from ov3det.models.pointnet import PointnetSAModule
from ov3det.models.pos_embed import PositionEmbeddingCoords
from ov3det.models.transformer import (
    MaskedTransformerEncoder,
    TransformerDecoder,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerEncoderLayer,
)

__all__ = [
    "Model3DETR",
    "decode_boxes",
    "last_layer_outputs",
    "GenericMLP",
    "PointnetSAModule",
    "PositionEmbeddingCoords",
    "MaskedTransformerEncoder",
    "TransformerDecoder",
    "TransformerDecoderLayer",
    "TransformerEncoder",
    "TransformerEncoderLayer",
]
