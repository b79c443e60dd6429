"""Due-now evaluation for the DAG's declarative ``schedule`` field.

``pipeline/dag.py`` carries the reference's cron spec
(dags/example_etl_dag.py:19-33, ``schedule_interval='30 13 * * 0'``) as
data and fires only on an explicit ``run()`` — WHEN to run is the
orchestrator's concern. This module is that orchestrator's evaluation
loop as a pure function: given a frozen clock, which schedule ticks are
due? No daemon, no wall clock — the caller supplies ``now``, so a cron
tick in any scheduler (a systemd timer, an Airflow sensor, a while-loop)
reduces to one ``due_runs`` call, and tests freeze time trivially.

Cron semantics implemented (the classic five-field dialect Airflow's
``schedule_interval`` strings use): minute hour day-of-month month
day-of-week; ``*``, lists, ranges, ``*/step`` and ``a-b/step``;
day-of-week 0 and 7 are both Sunday; when BOTH day fields are
restricted the day matches if EITHER does (the POSIX crontab union
rule). Catchup mirrors Airflow's ``catchup=False`` default: of several
missed ticks only the LATEST is enqueued; ``catchup=True`` enqueues
every missed tick oldest-first (the backfill contract,
pipeline/backfill.py).

Pure driver-side control plane — nothing here touches Spark.
"""

from __future__ import annotations

from datetime import date, datetime, time, timedelta

_FIELDS = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("day-of-month", 1, 31),
    ("month", 1, 12),
    ("day-of-week", 0, 7),
)

_MAX_SCAN_DAYS = 366 * 5  # an unsatisfiable spec (Feb 30) fails loudly


def _parse_field(text: str, name: str, lo: int, hi: int) -> set[int] | None:
    """One cron field to its value set; None means ``*`` (unrestricted,
    which the day-union rule must distinguish from an explicit full
    range)."""
    if text == "*":
        return None
    out: set[int] = set()
    for part in text.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                raise ValueError(f"bad cron step in {name}: {step_s!r}")
            step = int(step_s)
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            if not (a_s.isdigit() and b_s.isdigit()):
                raise ValueError(f"bad cron range in {name}: {part!r}")
            a, b = int(a_s), int(b_s)
        elif part.isdigit():
            a = b = int(part)
        else:
            raise ValueError(f"bad cron value in {name}: {part!r}")
        if a > b or a < lo or b > hi:
            raise ValueError(
                f"cron {name} value {part!r} outside [{lo}, {hi}]"
            )
        out.update(range(a, b + 1, step))
    if name == "day-of-week" and 7 in out:  # 7 is Sunday, same as 0
        out.discard(7)
        out.add(0)
    return out


def parse_cron(spec: str) -> tuple[set[int] | None, ...]:
    """Five parsed value sets (minute, hour, dom, month, dow); raises
    ValueError on malformed specs so a typo'd schedule fails at DAG
    definition, not silently never-fires."""
    parts = spec.split()
    if len(parts) != 5:
        raise ValueError(
            f"cron spec must have 5 fields, got {len(parts)}: {spec!r}"
        )
    return tuple(
        _parse_field(p, name, lo, hi)
        for p, (name, lo, hi) in zip(parts, _FIELDS)
    )


def _day_matches(
    d: date,
    dom: set[int] | None,
    month: set[int] | None,
    dow: set[int] | None,
) -> bool:
    if month is not None and d.month not in month:
        return False
    cron_dow = (d.weekday() + 1) % 7  # Monday=0 → cron Sunday=0
    if dom is not None and dow is not None:
        return d.day in dom or cron_dow in dow  # POSIX union rule
    if dom is not None:
        return d.day in dom
    if dow is not None:
        return cron_dow in dow
    return True


def cron_matches(spec: str, ts: datetime) -> bool:
    """Does ``ts`` (to minute precision) satisfy ``spec``?"""
    minute, hour, dom, month, dow = parse_cron(spec)
    if minute is not None and ts.minute not in minute:
        return False
    if hour is not None and ts.hour not in hour:
        return False
    return _day_matches(ts.date(), dom, month, dow)


def next_fire(spec: str, after: datetime) -> datetime:
    """First schedule tick STRICTLY after ``after`` (minute precision).
    Scans by day with the matched (hour, minute) grid inside — bounded
    at five years so an unsatisfiable spec raises instead of spinning."""
    minute, hour, dom, month, dow = parse_cron(spec)
    minutes = sorted(minute) if minute is not None else range(60)
    hours = sorted(hour) if hour is not None else range(24)
    floor = (after + timedelta(minutes=1)).replace(second=0, microsecond=0)
    d = floor.date()
    for _ in range(_MAX_SCAN_DAYS):
        if _day_matches(d, dom, month, dow):
            for hh in hours:
                for mm in minutes:
                    cand = datetime.combine(d, time(hh, mm))
                    if cand >= floor:
                        return cand
        d = d + timedelta(days=1)
        floor = datetime.combine(d, time.min)
    raise ValueError(f"cron spec never fires within 5 years: {spec!r}")


def prev_fire(spec: str, at: datetime) -> datetime:
    """Last schedule tick AT or BEFORE ``at`` (minute precision) — the
    backward twin of ``next_fire``, same five-year scan bound."""
    minute, hour, dom, month, dow = parse_cron(spec)
    minutes = (
        sorted(minute, reverse=True)
        if minute is not None
        else range(59, -1, -1)
    )
    hours = (
        sorted(hour, reverse=True) if hour is not None else range(23, -1, -1)
    )
    d = at.date()
    for _ in range(_MAX_SCAN_DAYS):
        if _day_matches(d, dom, month, dow):
            for hh in hours:
                for mm in minutes:
                    cand = datetime.combine(d, time(hh, mm))
                    if cand <= at:
                        return cand
        d = d - timedelta(days=1)
    raise ValueError(f"cron spec never fired within 5 years: {spec!r}")


def due_runs(
    spec: str,
    now: datetime,
    last_run: datetime | None = None,
    start: datetime | None = None,
    catchup: bool = False,
) -> list[datetime]:
    """Schedule ticks due at ``now``: every tick in (floor, now] where
    floor is ``last_run`` (or ``start`` for a never-run DAG). With
    ``catchup=False`` (the Airflow default) only the LATEST missed tick
    is returned — a weekly pipeline down for a month runs once, not
    four times; ``catchup=True`` returns all missed ticks oldest-first
    for an explicit backfill."""
    floor = last_run if last_run is not None else start
    if floor is None:
        raise ValueError(
            "due_runs needs last_run or start: a never-run DAG without a"
            " start date has no well-defined first tick"
        )
    if not catchup:
        # resolve the latest tick directly (one backward scan): the
        # forward enumeration below would walk — and at >100000 missed
        # ticks, cap out on — every tick a frequent schedule missed
        # while idle, just to keep the last one; Airflow's
        # catchup=False runs that pipeline fine (round-14 ADVICE, low)
        t = prev_fire(spec, now)
        return [t] if t > floor else []
    ticks: list[datetime] = []
    t = floor
    while True:
        t = next_fire(spec, t)
        if t > now:
            break
        ticks.append(t)
        if len(ticks) > 100_000:
            raise ValueError(
                f"more than 100000 due ticks for {spec!r}; narrow the"
                " window or backfill explicitly"
            )
    return ticks


def due_now(
    pipeline,
    now: datetime,
    last_run: datetime | None = None,
    start: datetime | None = None,
    catchup: bool = False,
) -> list[datetime]:
    """``due_runs`` over a ``dag.Pipeline``'s declared schedule; a
    schedule-less (manual-only) pipeline is never due."""
    if pipeline.schedule is None:
        return []
    return due_runs(
        pipeline.schedule, now, last_run=last_run, start=start,
        catchup=catchup,
    )
