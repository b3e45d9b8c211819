from .model import SAMConfig, init_params, sam_encode_image, sam_predict_masks
