from .schedule import DiffusionSchedule, linear_beta_schedule
from .process import (
    q_sample,
    predict_x0_from_eps,
    ddpm_posterior_mean,
    ddpm_sampling_variance,
    ddim_coefficients,
)
from .sampler import ddpm_sample, ddim_sample
from .dpm_solver import dpm_solver_coefficients, dpm_solver_pp_2m_sample
