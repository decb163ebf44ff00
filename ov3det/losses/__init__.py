from ov3det.losses.criterion import (
    compute_assignments,
    huber_loss,
    set_criterion,
)

__all__ = ["compute_assignments", "huber_loss", "set_criterion"]
