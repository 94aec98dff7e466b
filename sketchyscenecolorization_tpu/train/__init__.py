from .schedules import tf1_polynomial_decay, fg_gan_lr_decay
from .losses import (
    weighted_logistic_loss, l2_regularization_loss, smooth_l1, dsc_loss, iou_loss,
    acgan_focal_loss, wgan_sn_losses, wgan_gp_losses, dragan_losses,
    bg_gan_losses, masked_l1_loss, region_softmax_xent,
)
from .matching import (
    MatchingTrainState, create_matching_state, matching_loss_fn,
    make_matching_train_step,
)
from .fg_gan import (
    FGGanTrainState, create_fg_gan_state, make_fg_gan_train_step,
)
from .bg_gan import (
    BGGanTrainState, create_bg_gan_state, make_bg_gan_train_step,
)
from .watchdog import NaNWatchdog, run_with_nan_restart
from .harness import (
    train_matching, eval_matching, train_fg_gan, train_bg_gan,
)
