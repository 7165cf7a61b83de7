"""Config system (reference `cubercnn.config` surface)."""
from .cfg import CfgNode, StaticCfg  # noqa: F401
from .defaults import get_cfg_defaults, get_default_cfg, validate_cfg  # noqa: F401
