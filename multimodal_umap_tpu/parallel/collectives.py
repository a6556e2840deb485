"""Compiled-HLO collective accounting (communication-volume testing).

Multi-chip *performance* cannot be measured on a single-chip tunnel,
but communication volume can: lower a jitted program over the 8-device
virtual CPU mesh, parse the compiled HLO for collective ops, and sum
their result bytes. Used by tools/inspect_epoch_collectives.py (the
diagnostic report) and tests/test_sharding.py (the regression gate on
the shard_map layout epoch -- VERDICT r2 next-step 3).

No reference counterpart (the reference is single-device,
/root/reference/impl/model.py:10; SURVEY.md §2.9).
"""

from __future__ import annotations

import re

_COLLECTIVE_RE = re.compile(
    r"^\s*%?\S+\s*=\s*"
    r"(\(?(?:[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?(?:, (?:/\*[^*]*\*/ ?)?)?)+\)?)\s+"
    r"(all-gather|all-reduce|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\(",
)

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def collective_summary(hlo_text: str) -> dict:
    """Parses compiled HLO text -> per-collective-op byte totals.

    Returns {"ops": [(kind, shape_str, bytes)], "total_bytes": int,
    "by_kind": {kind: bytes}}. Bytes are the op RESULT size (for
    all-gather that is the full gathered table -- what lands on every
    device; for reduce-scatter the sharded result).
    """
    ops = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        shapes_str, kind = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(shapes_str):
            if dt not in _DTYPE_BYTES:
                continue
            size = 1
            for d in dims.split(","):
                if d:
                    size *= int(d)
            nbytes += size * _DTYPE_BYTES[dt]
        ops.append((kind, shapes_str.strip(), nbytes))
    by_kind: dict[str, int] = {}
    for kind, _, b in ops:
        by_kind[kind] = by_kind.get(kind, 0) + b
    return {
        "ops": ops,
        "total_bytes": sum(b for _, _, b in ops),
        "by_kind": by_kind,
    }
