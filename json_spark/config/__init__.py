from .rules import (
    BoolFromNull,
    BoolFromNumbers,
    BoolFromStrings,
    BoolRules,
    DateFromNumbers,
    DateFromStrings,
    DateRules,
    FlexKeys,
    NumberFromStrings,
    NumberRules,
    RuleConfig,
    default_config,
    strict_config,
)
from .context import current_config, scoped_config
from .loader import load_config, config_from_dict
from .random import random_config

__all__ = [
    "BoolFromNull",
    "BoolFromNumbers",
    "BoolFromStrings",
    "BoolRules",
    "DateFromNumbers",
    "DateFromStrings",
    "DateRules",
    "FlexKeys",
    "NumberFromStrings",
    "NumberRules",
    "RuleConfig",
    "default_config",
    "strict_config",
    "load_config",
    "config_from_dict",
    "random_config",
    "current_config",
    "scoped_config",
]
