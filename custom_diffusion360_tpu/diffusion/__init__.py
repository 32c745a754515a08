"""Diffusion engine layer: EDM preconditioning, sigma schedules, guiders,
samplers (lax.scan loops) and training losses.

TPU-native redesign of the reference's sgm/modules/diffusionmodules/
{denoiser,discretizer,sigma_sampling,denoiser_scaling,denoiser_weighting,
sampling,guiders,loss}.py. Objects become pure functions + small frozen
configs; all randomness is explicit PRNG keys; sampling loops are jittable.
"""
from .discretization import (
    legacy_ddpm_sigmas,
    edm_sigmas,
    make_sigmas,
)
from .scaling import (
    eps_scaling,
    edm_scaling,
    v_scaling,
    unit_weighting,
    edm_weighting,
    v_weighting,
    eps_weighting,
    get_scaling,
    get_weighting,
)
from .sigma_sampling import (
    sample_sigmas_cubic,
    sample_sigmas_discrete,
    sample_sigmas_edm,
)
from .denoiser import DenoiserConfig, Denoiser
from .guiders import (
    identity_guider,
    linear_prediction_guider,
    vanilla_cfg,
    vanilla_cfg_img_ref,
    scheduled_cfg_img_text_ref,
)
from .sampling import (
    SamplerConfig,
    SAMPLERS,
    euler_edm_sample,
    heun_edm_sample,
    euler_ancestral_sample,
    dpmpp2s_ancestral_sample,
    dpmpp2m_sample,
    linear_multistep_sample,
    multidiffusion_sample,
    to_d,
)
from .loss import DiffusionLossConfig, diffusion_loss_img_ref, combine_losses
