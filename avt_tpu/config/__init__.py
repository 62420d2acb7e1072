"""Config system: YAML group composition + Hydra-style override grammar.

Replaces the reference's Hydra 1.1 + OmegaConf stack (SURVEY.md §5.6) with
a self-contained engine that keeps the load-bearing surface:
  * conf/config.yaml with a defaults list of config groups
  * overrides: key=value, +key=value (new key), group=option,
    group@key=option, ~key (delete)
  * ${a.b} interpolation + resolvers ${minus:a,b}, ${times_int:a,b}, ${cwd}
  * comma sweeps expanded to run_id variants (BasicSweeper behavior)
  * _target_-driven object instantiation through a registry that maps the
    reference's target strings onto avt_tpu classes, so the reference's
    expts/ override files translate line-for-line.
"""
from avt_tpu.config.compose import Composer, compose, load_yaml, resolve_interpolations
from avt_tpu.config.overrides import (
    parse_override,
    parse_overrides_file,
    expand_sweeps,
)
from avt_tpu.config.registry import instantiate, register_target, resolve_target

__all__ = [
    "Composer",
    "compose",
    "load_yaml",
    "resolve_interpolations",
    "parse_override",
    "parse_overrides_file",
    "expand_sweeps",
    "instantiate",
    "register_target",
    "resolve_target",
]
