"""Configuration: JSON-driven parameters for the bases pipeline and the
simulator, schema-compatible with the reference config files."""

from animsnapbases_tpu.config.bases_config import BasesConfig
from animsnapbases_tpu.config.sim_config import SimConfig, default_sim_args
