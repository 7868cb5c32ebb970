from .preprocess import preprocess_images
from .ctc import ctc_loss

__all__ = ["preprocess_images", "ctc_loss"]
