from .loss import SS_PW, SS_NW, class_balanced_loss, l2_penalty, compute_class_balance_weights
from .metrics import MeanIoU, confusion_matrix_update, mean_iou_from_cm, empty_confusion_matrix
from .optimizer import make_optimizer, get_learning_rate, set_learning_rate

__all__ = [
    "SS_PW",
    "SS_NW",
    "class_balanced_loss",
    "l2_penalty",
    "compute_class_balance_weights",
    "MeanIoU",
    "confusion_matrix_update",
    "mean_iou_from_cm",
    "empty_confusion_matrix",
    "make_optimizer",
    "get_learning_rate",
    "set_learning_rate",
]
