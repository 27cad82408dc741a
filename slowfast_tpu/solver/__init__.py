from .losses import get_loss_func  # noqa
from .lr_policy import get_lr_at_epoch  # noqa
from .optimizer import construct_optimizer, get_grad_norm  # noqa
