from .phoregen import PhoreGen, qd_loss, exact_match_accuracy
from .diffusion_model import PhoreDiffNet
from .denoiser import UniDenoiser
