"""Compiled-HLO collective inspection for sharding audits.

Answers, from ``jit(...).lower(...).compile().as_text()``, the questions a
scaling audit asks: which collectives did the SPMD partitioner insert, how
many bytes does each move, and — the TP red flag — did it all-gather any
full weight kernel (meaning the 'model' sharding was undone instead of the
matmuls being split)?  Used by tests/test_tensor_parallel.py and the
docs/parallelism.md collective-bytes table.
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> Tuple[int, Tuple[int, ...]]:
    shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
    n = 1
    for d in shape:
        n *= d
    return n * _DTYPE_BYTES.get(dtype, 4), shape


def collective_stats(hlo_text: str) -> Dict[str, Dict]:
    """Per-op-kind {count, bytes, shapes} for every collective instruction.

    Bytes counted are the RESULT bytes of each instruction (the data that
    actually crosses links, up to the reduction factor).  ``-start`` /
    ``-done`` async pairs are counted once (on the start).
    """
    stats: Dict[str, Dict] = {
        op: {"count": 0, "bytes": 0, "shapes": []} for op in COLLECTIVE_OPS
    }
    for line in hlo_text.splitlines():
        for op in COLLECTIVE_OPS:
            is_start = f" {op}-start(" in line
            if not is_start and f" {op}(" not in line:
                continue
            lhs = line.split(f" {op}", 1)[0]
            found = [_shape_bytes(m.group(1), m.group(2))
                     for m in _SHAPE_RE.finditer(lhs)]
            if is_start and len(found) > 1:
                # Async start returns (operand(s)..., destination): count
                # only the destination buffer, not the input alias.
                found = found[-1:]
            stats[op]["count"] += 1
            stats[op]["bytes"] += sum(b for b, _ in found)
            stats[op]["shapes"].extend(s for _, s in found if s)
            break
    return stats


def full_kernel_allgathers(
    hlo_text: str, kernel_shapes: Sequence[Tuple[int, ...]]
) -> List[Tuple[int, ...]]:
    """All-gather results whose shape equals a full weight-kernel shape —
    evidence the partitioner materialized an unsharded kernel."""
    wanted = {tuple(s) for s in kernel_shapes}
    stats = collective_stats(hlo_text)
    return [s for s in stats["all-gather"]["shapes"] if tuple(s) in wanted]
