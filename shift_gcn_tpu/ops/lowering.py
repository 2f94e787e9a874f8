"""Lowering / fusion selection as explicit, per-model configuration.

Every alternative lowering in the compute path (six temporal-shift
lowerings, three spatial-transform lowerings, the fusion passes, the
low-precision BN normalize) used to be selected by process-global SGT_*
environment variables read inside op code.  That made numerics ambient
state: two models with different lowerings could not coexist in one
process, and a run's config snapshot did not record which lowering
produced its numbers.

This module makes the selection a value: a frozen, hashable `Lowering`
dataclass carried on the model config (`ModelConfig.lowering`) and
threaded into the ops as a static (nondiff) argument — so the choice is
part of every jit cache key that closes over the config, never ambient.

Precedence (resolve()): defaults < config < environment.  The SGT_* env
vars keep working as a per-process override for quick probes/benchmarks
(a set env var beats the config value; the overlay happens at trace
time, so tests can monkeypatch as before).  Production runs should use
the config key — the trainer writes the RESOLVED lowering into the
work-dir config snapshot, making every run self-describing.

Knobs (reference for what each selects — measured numbers in
docs/PERF.md):

- tshift_impl: temporal fractional-shift lowering
  (ops/temporal_shift.py) — "dft" (default; frequency-domain, Parseval
  VJP), "conv" (depthwise hat-tap conv), "slice", "matmul", "roll"
  (crashes this platform's remote compile helper), "pallas".
- sgcn_impl: spatial Shift-GCN transform (ops/spatial_shift.py) —
  "dft" (default), "circconv", "chain".
- sshift_impl: standalone spatial shift ("gather" default, "roll",
  "onehot"); only reaches the model path via sgcn_impl="chain".
- tcn_fuse: fused shift_in+1x1 as one dense conv (measured slower;
  kept as an option).
- tcn_freq_fuse: fused freq-domain shift+1x1 — "eval" (default: fused
  in eval only, +3.5%), "1" (always), "0" (never).  Requires
  tshift_impl="dft"; compute_dtype runs fall back (see model code).
- tcn_bnfold: fold the BN affine through the shift into the 1x1
  weights (requires tshift_impl="conv"; measured dead, docs/PERF.md).
- bn_lp / bn_lp_eval: low-precision BN normalize pass in training /
  eval (ops/batchnorm.py; eval default on: +5-7% at bf16).
- max_shift: static temporal tap radius (exact while |ypos| stays
  inside it; trainer checks at eval/save boundaries).  Threaded
  explicitly through EVERY lowering including the time-sharded halo
  path (parallel/halo.py) and the Pallas temporal kernel — no op reads
  SGT_MAX_SHIFT except through resolve().
- exact_xpos: keep the exact 3-tap joint-axis pass instead of the
  xpos==0 lowering (parity tests use this; xpos never trains —
  reference shift_cuda_kernel.cu:386).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

_TSHIFT_IMPLS = ("conv", "slice", "roll", "matmul", "dft", "pallas")
_SGCN_IMPLS = ("chain", "circconv", "dft")
_SSHIFT_IMPLS = ("gather", "roll", "onehot")
_FREQ_FUSE = ("0", "1", "eval")


@dataclasses.dataclass(frozen=True)
class Lowering:
    tshift_impl: str = "dft"
    sgcn_impl: str = "dft"
    sshift_impl: str = "gather"
    tcn_fuse: bool = False
    tcn_freq_fuse: str = "eval"
    tcn_bnfold: bool = False
    bn_lp: bool = False
    bn_lp_eval: bool = True
    max_shift: int = 8
    exact_xpos: bool = False

    def __post_init__(self) -> None:
        # every construction path validates — a programmatic
        # Lowering(tshift_impl='dtf') typo must raise here, not lower
        # silently as some other impl downstream (advisor r4)
        self.validate()

    @property
    def xpos_zero(self) -> bool:
        """True when the joint-axis (xpos) interpolation lowers as the
        identity (see ops/temporal_shift.py ASSUME_XPOS_ZERO rationale)."""
        return not self.exact_xpos

    def validate(self) -> "Lowering":
        for val, allowed, name in (
                (self.tshift_impl, _TSHIFT_IMPLS, "tshift_impl"),
                (self.sgcn_impl, _SGCN_IMPLS, "sgcn_impl"),
                (self.sshift_impl, _SSHIFT_IMPLS, "sshift_impl"),
                (str(self.tcn_freq_fuse), _FREQ_FUSE, "tcn_freq_fuse")):
            if val not in allowed:
                raise ValueError(
                    f"lowering.{name}={val!r}: must be one of {allowed}")
        if self.max_shift < 1:
            raise ValueError(
                f"lowering.max_shift={self.max_shift}: must be >= 1")
        return self


def _b01(raw: str) -> bool:          # "1" enables (SGT_TCN_FUSE style)
    return raw == "1"


def _bnot0(raw: str) -> bool:        # anything but "0" enables
    return raw != "0"


# field -> (env var, parser).  Parsers reproduce each var's historical
# semantics exactly (e.g. SGT_BN_LP_EVAL was enabled unless "0").
_ENV = {
    "tshift_impl": ("SGT_TSHIFT_IMPL", str),
    "sgcn_impl": ("SGT_SGCN_IMPL", str),
    "sshift_impl": ("SGT_SSHIFT_IMPL", str),
    "tcn_fuse": ("SGT_TCN_FUSE", _b01),
    "tcn_freq_fuse": ("SGT_TCN_FREQ_FUSE", str),
    "tcn_bnfold": ("SGT_TCN_BNFOLD", _b01),
    "bn_lp": ("SGT_BN_LP", _b01),
    "bn_lp_eval": ("SGT_BN_LP_EVAL", _bnot0),
    "max_shift": ("SGT_MAX_SHIFT", int),
    "exact_xpos": ("SGT_EXACT_XPOS", _b01),
}


def from_dict(d: Optional[Dict[str, Any]]) -> Lowering:
    """Build a Lowering from a (config-file) dict; unknown keys raise
    (same WRONG-ARG contract as the experiment config)."""
    d = dict(d or {})
    valid = {f.name for f in dataclasses.fields(Lowering)}
    unknown = set(d) - valid
    if unknown:
        raise KeyError(
            f"WRONG ARG in lowering config: {sorted(unknown)}; "
            f"valid keys: {sorted(valid)}")
    # YAML booleans/ints arrive typed; strings for the enum fields.
    # Bool fields parse string spellings explicitly — bool("0") is True,
    # which would silently invert quoted YAML like `bn_lp: "0"`.
    _TRUE = {"1", "true", "yes", "on"}
    _FALSE = {"0", "false", "no", "off"}
    coerced = {}
    for k, v in d.items():
        default = getattr(Lowering(), k)
        if isinstance(default, bool):
            if isinstance(v, str):
                lv = v.strip().lower()
                if lv in _TRUE:
                    v = True
                elif lv in _FALSE:
                    v = False
                else:
                    raise ValueError(
                        f"lowering.{k}={v!r}: not a boolean "
                        f"(use true/false)")
            coerced[k] = bool(v)
        elif isinstance(default, int):
            coerced[k] = int(v)
        else:
            coerced[k] = str(v)
    return Lowering(**coerced)  # __post_init__ validates


def env_overrides() -> Dict[str, Any]:
    """The lowering fields currently pinned by SGT_* env vars (only vars
    that are actually set appear)."""
    out: Dict[str, Any] = {}
    for field, (var, parse) in _ENV.items():
        raw = os.environ.get(var)
        if raw is not None:
            out[field] = parse(raw)
    return out


def resolve(base: Optional[Lowering] = None) -> Lowering:
    """Effective lowering: `base` (or defaults) with any set SGT_* env
    vars overlaid (env > config > default).  Called at trace time by the
    model/ops so env monkeypatching keeps working for probes."""
    overrides = env_overrides()
    base = base or Lowering()
    if not overrides:
        return base
    return dataclasses.replace(base, **overrides)  # __post_init__ validates


def as_dict(low: Lowering) -> Dict[str, Any]:
    return dataclasses.asdict(low)
