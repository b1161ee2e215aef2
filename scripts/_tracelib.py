"""Shared jax.profiler trace-viewer parsing for the profile_trace_* scripts.

Single home of the EXCLUSIVE-duration computation: XLA emits NESTED spans on
the 'XLA Ops' device thread (a `while` span contains its condition and body
computations), so summing raw durations double-counts every parent. Each
script that aggregates per-op/per-category device time must use
`exclusive_op_durations`, not raw sums.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import List, Tuple


def load_latest_trace(outdir: str):
    """Parses the newest trace.json.gz under a jax.profiler trace dir;
    returns its traceEvents list (or None when no trace was written)."""
    paths = sorted(glob.glob(os.path.join(
        outdir, 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        return None
    with gzip.open(paths[-1], 'rt') as f:
        return json.load(f).get('traceEvents', [])


def exclusive_op_durations(events) -> List[Tuple[str, float]]:
    """[(op_name, exclusive_dur_us)] over the device 'XLA Ops' threads.

    Per thread, spans are sorted by start time and each child's duration is
    subtracted from its innermost enclosing span, so totals are
    double-count-free even for while/fusion parents."""
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name' and 'args' in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if 'tpu' in name.lower()}
    op_tids = {(e['pid'], e['tid']) for e in events if e.get('ph') == 'M'
               and e.get('name') == 'thread_name' and 'args' in e
               and 'XLA Ops' in e['args'].get('name', '')}

    per_tid = collections.defaultdict(list)
    for e in events:
        if (e.get('ph') == 'X' and e.get('pid') in device_pids
                and (e['pid'], e.get('tid')) in op_tids):
            per_tid[(e['pid'], e['tid'])].append(e)

    exclusive: List[List] = []
    for tid_events in per_tid.values():
        tid_events.sort(key=lambda e: (e['ts'], -e.get('dur', 0)))
        stack = []  # (end_ts, index into exclusive)
        for e in tid_events:
            ts, dur = e['ts'], e.get('dur', 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                exclusive[stack[-1][1]][1] -= dur
            exclusive.append([e.get('name', ''), dur])
            stack.append((ts + dur, len(exclusive) - 1))
    return [(name, max(dur, 0)) for name, dur in exclusive]
