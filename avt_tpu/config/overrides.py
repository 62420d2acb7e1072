"""Override grammar: parsing + sweep expansion.

Grammar (the subset of Hydra the reference's expts/ files use, verified
against every file in /root/reference/expts):
  key=value             assign (key must exist unless prefixed +)
  +key=value            add a new key
  group=option          switch a config group (key exists in defaults)
  group@key=option      compose a group instance at a different key
  +group@key=option     same, key may be new
  ~key                  delete a key
Values parse as YAML (so lists/dicts/bools/null work); a value with
top-level commas is a SWEEP: the config expands to one variant per element
(cartesian across swept keys), each getting its own run_id, matching
Hydra's BasicSweeper + hydra.sweep.subdir=${hydra.job.num}.
"""
from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import yaml


@dataclass
class Override:
    key: str
    value: Any = None
    add: bool = False  # '+' prefix
    delete: bool = False  # '~' prefix
    group: Optional[str] = None  # group path for group@key syntax
    sweep_values: Optional[List[str]] = None  # raw strings when swept


def _split_top_level_commas(s: str) -> List[str]:
    """Split on commas not nested in brackets/braces/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "[{(":
            depth += 1
            buf.append(ch)
        elif ch in "]})":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


_INTERP_TOKEN_RE = re.compile(r"\$\{[^{}]*\}")


class _QuotedStr(str):
    """A scalar that was explicitly quoted in the source — opts out of the
    sci-notation coercion even when nested inside a flow collection
    (hydra keeps quoted scalars as strings at any depth)."""


class _StyleLoader(yaml.SafeLoader):
    """SafeLoader that remembers which str scalars were quoted."""


def _construct_str_with_style(loader, node):
    val = loader.construct_scalar(node)
    return _QuotedStr(val) if node.style in ("'", '"') else val


_StyleLoader.add_constructor(
    "tag:yaml.org,2002:str", _construct_str_with_style
)


def parse_value(raw: str) -> Any:
    """YAML-parse a value; ${...} interpolations survive as strings.

    YAML flow mappings reject bare `${a.b}` scalars, so interpolations are
    swapped for placeholder tokens around the parse and restored after.
    """
    raw = raw.strip()
    tokens: List[str] = []

    def stash(m):
        tokens.append(m.group(0))
        return f"__INTERP_{len(tokens) - 1}__"

    prepared = _INTERP_TOKEN_RE.sub(stash, raw)
    try:
        parsed = yaml.load(prepared, Loader=_StyleLoader)
    except yaml.YAMLError:
        return raw

    def restore(v, coerce=True):
        if isinstance(v, str):
            was_quoted = isinstance(v, _QuotedStr)
            v = re.sub(
                r"__INTERP_(\d+)__", lambda m: tokens[int(m.group(1))], v
            )
            # YAML 1.1 wants "1.0e-5"; hydra's grammar accepts "1e-5".
            # Coerce dot-less scientific notation that pyyaml left a string
            # — unless it was explicitly quoted (at any nesting depth).
            if (
                coerce
                and not was_quoted
                and re.fullmatch(r"[+-]?\d+[eE][+-]?\d+", v)
            ):
                return float(v)
            return str(v)  # plain str: the style marker must not leak out
        if isinstance(v, dict):
            return {
                restore(k, coerce=False): restore(val)
                for k, val in v.items()
            }
        if isinstance(v, list):
            return [restore(x) for x in v]
        return v

    return restore(parsed)


def parse_override(line: str) -> Override:
    line = line.strip()
    add = line.startswith("+")
    delete = line.startswith("~")
    if add or delete:
        line = line[1:]
    if delete:
        return Override(key=line, delete=True)
    if "=" not in line:
        raise ValueError(f"Override needs '=': {line!r}")
    key, raw_val = line.split("=", 1)
    key = key.strip()
    group = None
    if "@" in key:
        group, key = key.split("@", 1)
    parts = _split_top_level_commas(raw_val)
    if len(parts) > 1:
        return Override(
            key=key, add=add, group=group,
            sweep_values=[p.strip() for p in parts],
        )
    return Override(key=key, value=parse_value(raw_val), add=add, group=group)


def parse_overrides_file(fpath: str) -> List[Override]:
    """Read a TXT experiment file: one override per line, '#' comments."""
    overrides = []
    with open(fpath, "r") as fin:
        for line in fin:
            line = line.split("#")[0].strip()
            if not line:
                continue
            overrides.append(parse_override(line))
    return overrides


def expand_sweeps(overrides: List[Override]) -> List[List[Override]]:
    """Expand swept overrides into the cartesian list of run variants."""
    swept = [o for o in overrides if o.sweep_values is not None]
    if not swept:
        return [overrides]
    choices = [
        [(o, parse_value(v)) for v in o.sweep_values] for o in swept
    ]
    variants = []
    for combo in itertools.product(*choices):
        variant = []
        combo_map = {id(o): val for o, val in combo}
        for o in overrides:
            if o.sweep_values is not None:
                variant.append(
                    Override(key=o.key, value=combo_map[id(o)], add=o.add,
                             group=o.group)
                )
            else:
                variant.append(o)
        variants.append(variant)
    return variants
