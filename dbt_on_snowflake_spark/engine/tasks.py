"""Scheduled tasks — the engine-side equivalent of the reference's
Snowflake TASK (``setup/task.sql:1-6``: ``CREATE TASK dbt_task WAREHOUSE=...
SCHEDULE='USING CRON 5 * * * * UTC' AS EXECUTE DBT PROJECT ... ARGS='run
--select customer_loyalty_metrics --target dev'``).

Snowflake owns a daemon; this engine is invoked by any external cron
(the idempotent-CLI contract SURVEY §3.4 records), so the surface here is
deliberately daemon-free and deterministic:

- ``tasks.yml`` declares tasks: a name, a 5-field cron ``schedule``
  (Snowflake's ``USING CRON <expr> <tz>`` prefix accepted and stripped),
  and the CLI ``args`` string to execute.
- ``task run-due --now <ts>`` executes every task whose cron matches the
  given minute, exactly once per (task, scheduled-minute): ticks are
  journaled to ``target/task_runs.jsonl`` so a retried cron invocation —
  or two overlapping runners — cannot double-fire a tick.
- ``task list`` shows each task with its next fire time, ``task run
  --name`` force-runs one.

The executed args go through the SAME ``main()`` entry as a human
invocation (selection, targets, retry semantics all apply), matching how
EXECUTE DBT PROJECT re-enters the dbt CLI.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from datetime import datetime, timedelta


@dataclass
class TaskDef:
    name: str
    schedule: str  # normalized 5-field cron
    args: str  # CLI args string, e.g. "run --select foo --target dev"


class CronError(ValueError):
    pass


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    """One cron field -> the set of matching values. Supports ``*``,
    ``*/n``, ``a``, ``a-b``, ``a-b/n`` and comma lists thereof."""
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) == 0:
                raise CronError(f"bad step {step_s!r}")
            step = int(step_s)
        if part == "*":
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            if not (a.isdigit() and b.isdigit()):
                raise CronError(f"bad range {part!r}")
            lo2, hi2 = int(a), int(b)
        elif part.isdigit():
            lo2 = hi2 = int(part)
        else:
            raise CronError(f"bad cron field part {part!r}")
        if lo2 < lo or hi2 > hi or lo2 > hi2:
            raise CronError(f"cron value out of range: {part!r} ({lo}-{hi})")
        out.update(range(lo2, hi2 + 1, step))
    return out


def normalize_schedule(raw: str) -> str:
    """Accept Snowflake's ``USING CRON <5 fields> <tz>`` or a plain
    5-field expression; return the bare 5-field cron. The timezone is
    validated as present-or-absent but not applied — ticks are evaluated
    against the ``--now`` timestamp the caller supplies, which carries
    the zone decision (the engine never reads a wall clock)."""
    s = raw.strip()
    if s.upper().startswith("USING CRON"):
        s = s[len("USING CRON"):].strip()
    parts = s.split()
    if len(parts) == 6:  # trailing timezone word (e.g. UTC)
        # The 6th token must LOOK like a timezone (advice r8): a
        # seconds-style 6-field cron like '0 5 * * * *' must error, not
        # be silently reinterpreted as daily-at-05:00 with tz '*'.
        if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_/+-]*", parts[5]):
            raise CronError(
                f"schedule {raw!r}: 6th token {parts[5]!r} is not a "
                "timezone name — seconds-resolution crons are not "
                "supported (use 5 fields, optionally followed by a tz)"
            )
        parts = parts[:5]
    if len(parts) != 5:
        raise CronError(
            f"schedule {raw!r}: expected 5 cron fields "
            "(minute hour day-of-month month day-of-week)"
        )
    return " ".join(parts)


def cron_matches(schedule: str, ts: datetime) -> bool:
    """Does the (normalized) cron expression fire at this minute?
    Standard cron semantics, including the dom/dow union rule: when BOTH
    day fields are restricted, a date matching EITHER fires."""
    mi, hr, dom, mo, dow = schedule.split()
    if ts.minute not in _parse_field(mi, 0, 59):
        return False
    if ts.hour not in _parse_field(hr, 0, 23):
        return False
    if ts.month not in _parse_field(mo, 1, 12):
        return False
    dom_set = _parse_field(dom, 1, 31)
    # cron day-of-week: 0=Sunday..6=Saturday; Python: Monday=0..Sunday=6
    dow_set = _parse_field(dow, 0, 7)
    if 7 in dow_set:  # 7 is an accepted alias for Sunday
        dow_set.add(0)
    cron_dow = (ts.weekday() + 1) % 7
    dom_ok = ts.day in dom_set
    dow_ok = cron_dow in dow_set
    if dom != "*" and dow != "*":
        return dom_ok or dow_ok
    return dom_ok and dow_ok


def next_fire(schedule: str, after: datetime, horizon_days: int = 366) -> datetime | None:
    """First minute strictly after ``after`` at which the cron fires."""
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    end = after + timedelta(days=horizon_days)
    while t <= end:
        if cron_matches(schedule, t):
            return t
        t += timedelta(minutes=1)
    return None


def load_tasks(project_root: str) -> list[TaskDef]:
    import yaml

    path = os.path.join(project_root, "tasks.yml")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    out = []
    seen: set[str] = set()
    for entry in doc.get("tasks", []):
        name = entry.get("name")
        if not name or name in seen:
            raise CronError(f"tasks.yml: missing or duplicate task name {name!r}")
        seen.add(name)
        out.append(
            TaskDef(
                name=name,
                schedule=normalize_schedule(str(entry["schedule"])),
                args=str(entry["args"]),
            )
        )
    return out


def _runs_path(project_root: str) -> str:
    return os.path.join(project_root, "target", "task_runs.jsonl")


def completed_ticks(project_root: str) -> set[tuple[str, str]]:
    """(task name, scheduled-minute iso) ticks already executed."""
    path = _runs_path(project_root)
    out: set[tuple[str, str]] = set()
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            out.add((rec["task"], rec["scheduled"]))
    return out


def record_tick(
    project_root: str, task: str, scheduled: datetime, rc: int
) -> None:
    path = _runs_path(project_root)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(
            json.dumps(
                {
                    "task": task,
                    "scheduled": scheduled.isoformat(timespec="minutes"),
                    "rc": rc,
                }
            )
            + "\n"
        )


def run_due(
    project_root: str,
    now: datetime,
    runner,
    only: str | None = None,
) -> list[tuple[str, str]]:
    """Execute every declared task whose cron matches ``now``'s minute
    and whose (task, minute) tick has not run yet. ``runner(task) ->
    int`` performs the CLI invocation; returns [(name, status)] for
    reporting. Exactly-once is per-tick, not per-day: the journal key is
    the scheduled minute, so a cron runner retrying within the same
    minute skips, while the next matching minute fires fresh.

    Exactly-once holds under genuinely CONCURRENT runners too (advice
    r8): the journal read is check-then-act, so each due tick is guarded
    by an O_CREAT|O_EXCL lock file (target/task_locks/<task>_<minute>);
    the loser of the create race reports the tick as claimed instead of
    double-firing. Lock files whose minute has aged past the GC horizon
    (48 h behind ``now`` — far beyond any plausible concurrent-runner
    overlap) are garbage-collected on each invocation, so the directory
    stays bounded for long-lived cron deployments; the journal entry
    (written by the winner after the run) remains the durable source of
    truth for completion. A runner that crashes between locking and
    journaling leaves its tick reported as claimed — `task run --name`
    is the explicit recovery (the journal shows the minute has no rc
    entry)."""
    tick = now.replace(second=0, microsecond=0)
    done = completed_ticks(project_root)
    results: list[tuple[str, str]] = []
    lock_dir = os.path.join(project_root, "target", "task_locks")
    # GC aged lock files (minute encoded in the name; no wall clock —
    # `now` drives this deterministically like everything else here).
    # Encoding was minute.replace(':', '-'): restore only the TIME
    # colon ("...T09-05" -> "...T09:05"); date dashes stay.
    horizon = tick - timedelta(hours=48)
    for fname in os.listdir(lock_dir) if os.path.isdir(lock_dir) else []:
        try:
            encoded = fname.rsplit("_", 1)[1]  # task names may have _
            date_part, time_part = encoded.split("T")
            lock_ts = datetime.fromisoformat(
                f"{date_part}T{time_part.replace('-', ':')}"
            )
        except (IndexError, ValueError):
            continue
        if lock_ts < horizon:
            try:
                os.remove(os.path.join(lock_dir, fname))
            except OSError:
                pass
    for t in load_tasks(project_root):
        if only is not None and t.name != only:
            continue
        if not cron_matches(t.schedule, tick):
            results.append((t.name, "not-due"))
            continue
        minute = tick.isoformat(timespec="minutes")
        key = (t.name, minute)
        if key in done:
            results.append((t.name, "already-ran"))
            continue
        os.makedirs(lock_dir, exist_ok=True)
        lock_path = os.path.join(
            lock_dir, f"{t.name}_{minute.replace(':', '-')}"
        )
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another runner claimed this tick between our journal read
            # and now (or crashed mid-run — surfaced as claimed, never
            # silently re-fired; `task run` forces a re-run if needed)
            results.append((t.name, "already-ran"))
            continue
        os.close(fd)
        rc = runner(t)
        record_tick(project_root, t.name, tick, rc)
        results.append((t.name, "success" if rc == 0 else f"error rc={rc}"))
    return results
