"""Seeded random rule-set generator — the reference's RandomConfig
(internal/dirtytesting/dirtytesting.go:14-77) ported to the dataclass
config tree.

Flag-by-flag mirror: every section is coin-flip disabled; enabled bool
string matching draws random true/false presets (3-6 entries) from the
reference dictionaries (dirtytesting.go:137,142); FromNumbers picks a
random parse algorithm; Number.FromStrings flips spacing / exponent /
commas and picks a random rounding algorithm; FlexKeys flips both
matching modes. One deliberate deviation: the reference populates the
custom bool lists / FromNull.Inverse inside ``if section.Disabled`` (the
condition looks inverted there — the values are then never read); here
they are populated when the section is ENABLED so the property harness
actually exercises them.
"""

from __future__ import annotations

import random as _random

from .rules import (
    ArrayRules,
    BoolFromNull,
    BoolFromNumbers,
    BoolFromStrings,
    BoolRules,
    FlexKeys,
    NumberFromStrings,
    NumberRules,
    RuleConfig,
)

#: dirtytesting.go:137,142
DICT_TRUES = ("true", "yes", "on", "1", "ok", "yep")
DICT_FALSES = ("false", "no", "off", "0", "nah", "nope", "")

BOOL_FROM_NUMBER_ALGS = ("binary", "positive_negative", "sign_of_one")
ROUNDING_ALGS = ("none", "floor", "round")


def _preset(rng: _random.Random, dict_: tuple[str, ...],
            lo: int = 3, hi: int = 6) -> tuple[str, ...]:
    """generateRandomPreset (dirtytesting.go:144-160): random subset of
    size lo..hi, order-stable for determinism."""
    count = min(rng.randint(lo, hi), len(dict_))
    picked = rng.sample(range(len(dict_)), count)
    return tuple(dict_[i] for i in sorted(picked))


def random_config(seed: int) -> RuleConfig:
    """Deterministic random rule set for property testing."""
    rng = _random.Random(seed)
    flip = lambda: rng.random() < 0.5  # noqa: E731

    bool_disabled = flip()
    if bool_disabled:
        bool_rules = BoolRules(disabled=True)
    else:
        fs_disabled = flip()
        from_strings = BoolFromStrings(
            disabled=fs_disabled,
            true_list=DICT_TRUES if fs_disabled else _preset(rng, DICT_TRUES),
            false_list=(DICT_FALSES if fs_disabled
                        else _preset(rng, DICT_FALSES)),
            case_insensitive=flip(),
            respect_from_numbers_logic=flip(),
        )
        fn_disabled = flip()
        from_numbers = BoolFromNumbers(
            disabled=fn_disabled,
            parse_func=rng.choice(BOOL_FROM_NUMBER_ALGS),
        )
        null_disabled = flip()
        from_null = BoolFromNull(disabled=null_disabled,
                                 inverse=(not null_disabled) and flip())
        bool_rules = BoolRules(
            disabled=False,
            fallback_value=flip(),
            from_strings=from_strings,
            from_numbers=from_numbers,
            from_null=from_null,
        )

    number_disabled = flip()
    if number_disabled:
        number_rules = NumberRules(disabled=True)
    else:
        nfs_disabled = flip()
        number_rules = NumberRules(
            disabled=False,
            from_strings=NumberFromStrings(
                disabled=nfs_disabled,
                spacing_allowed=(not nfs_disabled) and flip(),
                exponent_notation_allowed=(not nfs_disabled) and flip(),
                commas_allowed=(not nfs_disabled) and flip(),
                rounding_algorithm=rng.choice(ROUNDING_ALGS),
            ),
            from_bools_disabled=flip(),
            from_null_disabled=flip(),
        )

    fk_disabled = flip()
    return RuleConfig(
        bool_rules=bool_rules,
        number_rules=number_rules,
        flex_keys=FlexKeys(
            disabled=fk_disabled,
            case_insensitive=(not fk_disabled) and flip(),
            chameleon_case=(not fk_disabled) and flip(),
        ),
        array_rules=ArrayRules(disabled=flip(),
                               auto_wrap_single_values=flip(),
                               stringified_containers=flip()),
    )
