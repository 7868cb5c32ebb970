from .preprocess import preprocess_images, augment_images
from .deskew import device_deskew, estimate_skew_tan, shear_deskew
from .ctc import ctc_loss, mean_ctc_loss, resolve_ctc_impl
from .ctc_pallas import ctc_loss_pallas
from .lstm_pallas import lstm_layer_pallas, lstm_recurrence_pallas

__all__ = [
    "preprocess_images",
    "device_deskew",
    "estimate_skew_tan",
    "shear_deskew",
    "augment_images",
    "ctc_loss",
    "mean_ctc_loss",
    "resolve_ctc_impl",
    "ctc_loss_pallas",
    "lstm_layer_pallas",
    "lstm_recurrence_pallas",
]
