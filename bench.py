"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
MINIMAL JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}. The full payload (cpu_sec, noise_sentinel,
vs_prev, regression_detail) is file-only — BENCH_FULL_r{N}.json for the
env-less round run, BENCH_FULL_LAST.json otherwise — because the driver's
stdout capture tail-truncated the old oversized line two rounds running
(r16/r17 VERDICTs; BENCH_r16.json parsed: null).

Each query is run once to warm the JVM/parse paths, then timed (best of 5 —
the min is robust to the 1.1-1.3x uniform GC/scheduler noise this box shows;
r3's drift analysis in VERDICT.md motivated widening from best-of-3).

Noise immunity (r4 VERDICT: the official r4 number recorded a phantom
regression on a box with documented 5-10x hypervisor swings):

- ``cpu_sec`` records per-query PROCESS-TREE CPU seconds (driver python +
  local-mode JVM + pyspark workers, via /proc), best of 5. CPU seconds are
  invisible to hypervisor steal/throttle, so round-over-round comparisons
  should cite them, not wall time.
- ``noise_sentinel`` times a fixed trivial query between every rep and
  reports its spread; a spread well above ~1.3x means the box was noisy
  and the wall-clock totals of that run are not comparable.
- ``vs_prev`` (r5 VERDICT item 5) makes CPU-seconds the OFFICIAL
  round-over-round comparison: the newest committed BENCH_r{N}.json with a
  ``cpu_sec`` block is loaded and per-query + total CPU ratios are emitted
  in the JSON, wall-clock ratio only as a secondary. A verdict should read
  ``vs_prev.cpu_total_ratio``, never re-derive drift from wall time.
- ``host_cpu_calibration`` (r6): even CPU-seconds drift — an A/B re-run
  of the UNCHANGED r5 tree measured 6.8 -> 10.65 CPU-s on the identical
  dedup_clusters plan (hypervisor steal accounting). The sentinel's CPU
  cost is a fixed workload, so its round-over-round ratio calibrates the
  box; ``vs_prev.cpu_total_ratio_calibrated`` divides it out. Read THAT.
- Calibration protocol (r9, after r8's single-min sentinel produced an
  implausible 3.399 on a flat-wall run): the calibration workload now
  runs in a DEDICATED subprocess (fixed sha256 over 400 MiB, CPU read by
  the child via RUSAGE_SELF) so background JVM GC/cleanup from adjacent
  queries cannot contaminate it — the in-JVM Spark sentinel's tree-CPU
  delta showed a 7x within-run spread from exactly that contamination.
  ``noise_sentinel.host_cpu_median``/``host_cpu_spread`` summarize the
  >=5 interleaved reps. ``_vs_prev`` calibrates ONLY median-to-median
  and REFUSES otherwise — emitting ``calibration_unreliable`` with the
  reason — both when either run's within-run spread exceeds 1.5x and
  when the prior artifact predates the subprocess sentinel (its lone
  in-JVM cpu_min is the number r8's verdict proved non-calibrating).
- RE-BASELINE NOTE (r14 adjudication): the interleaved cross-round A/B
  (``AB_CROSSROUND_r14.json``, now ``tools/ab_bench.py``) proved the
  r11->r13 calibrated-CPU creep was HOST accounting drift (head/r11
  median 1.014 on identical trees; the sha256 sentinel itself rose 12%
  over the same rounds). Round-over-round ``vs_prev`` tripwires are
  therefore baselined on r13-and-later levels; when the tripwire fires
  again, run ``python -m hadoop_bam_spark.tools.ab_bench <old-ref>``
  before believing it — that interleaved A/B on the actual trees IS
  the adjudication, not the cross-session ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_CLK = os.sysconf("SC_CLK_TCK")


def _tree_cpu_seconds() -> float:
    """Total CPU seconds of this process and every live descendant — in
    local mode that is the driver, the single JVM, and the reused pyspark
    worker processes. Reading /proc avoids any dependency and sees through
    hypervisor steal (stolen time never shows up here).

    Counts utime+stime of each LIVE process PLUS its cutime+cstime (CPU of
    its reaped dead children). Measurement-bug fix (r17): the pre-r17 form
    summed only live utime+stime, so when a high-CPU descendant (an idle
    pyspark worker reaped by the daemon, a Python-datasource worker) died
    between the two samples of a query, its accumulated CPU VANISHED from
    the tree and the per-query delta went hugely negative (BENCH r17
    baseline recorded -55 cpu-s on pileup). A dead child's time moves into
    its parent's cutime exactly when it is reaped, and a live child's time
    is never in the parent's cutime, so live(utime+stime)+live(cutime+
    cstime) is monotone under deaths and never double-counts."""
    procs: dict[int, tuple[int, float]] = {}  # pid -> (ppid, cpu)
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat", "rb") as fh:
                stat = fh.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm may contain spaces/parens: fields start after the last ')'
        rest = stat.rsplit(")", 1)[-1].split()
        # rest[0]=state rest[1]=ppid ... rest[11]=utime rest[12]=stime
        # rest[13]=cutime rest[14]=cstime (reaped-children CPU)
        try:
            procs[int(entry)] = (
                int(rest[1]),
                (
                    int(rest[11]) + int(rest[12])
                    + int(rest[13]) + int(rest[14])
                ) / _CLK,
            )
        except (IndexError, ValueError):
            continue
    me = os.getpid()
    total = 0.0
    # walk up each process's ancestry to see if it hangs under us
    for pid, (ppid, cpu) in procs.items():
        cur = pid
        for _ in range(64):
            if cur == me:
                total += cpu
                break
            nxt = procs.get(cur)
            if nxt is None or nxt[0] in (0, cur):
                break
            cur = nxt[0]
    return total


def _tree_cpu_own() -> dict[int, float]:
    """pid -> OWN (utime+stime) CPU seconds for this process and every live
    descendant. Unlike :func:`_tree_cpu_seconds`, children's reaped CPU
    (cutime/cstime) is deliberately excluded — the caller accounts for
    deaths itself."""
    procs: dict[int, tuple[int, float]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat", "rb") as fh:
                stat = fh.read().decode("ascii", "replace")
        except OSError:
            continue
        rest = stat.rsplit(")", 1)[-1].split()
        try:
            procs[int(entry)] = (
                int(rest[1]), (int(rest[11]) + int(rest[12])) / _CLK
            )
        except (IndexError, ValueError):
            continue
    me = os.getpid()
    out: dict[int, float] = {}
    for pid, (ppid, cpu) in procs.items():
        cur = pid
        for _ in range(64):
            if cur == me:
                out[pid] = cpu
                break
            nxt = procs.get(cur)
            if nxt is None or nxt[0] in (0, cur):
                break
            cur = nxt[0]
    return out


class MonotoneTreeCpu:
    """Monotone process-tree CPU counter (measurement-bug fix #2, declared
    in OPTIMIZATION_r17.md).

    The cutime-based :func:`_tree_cpu_seconds` is monotone only when every
    dead descendant is *reaped by a live ancestor in the tree*: a pyspark
    daemon/worker whose parent never wait()s on it takes its accumulated
    CPU with it when it exits (the r17 runs recorded -12/-19.8 cpu-s on
    single queries). This counter instead samples every descendant's OWN
    utime+stime (never cutime, so nothing is ever counted twice) and BANKS
    a pid's last-seen value the moment it disappears — or when its counter
    goes backwards, which means pid reuse. A daemon thread samples every
    0.25 s so at most ~0.25 s of a dying process's tail is lost; read()
    also samples synchronously so query boundaries are exact."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._last: dict[int, float] = {}
        self._banked = 0.0
        self._sample()
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def _loop(self) -> None:
        while True:
            time.sleep(0.25)
            self._sample()

    def _sample(self) -> None:
        # The whole sample — /proc walk INCLUDED — runs under the lock
        # (ADVICE r17 medium): with the walk outside it, the 0.25 s daemon
        # sample and a synchronous read() sample could interleave so that
        # an OLDER snapshot overwrote a newer ``_last`` after a pid death
        # was banked — the dying pid's CPU banked twice and read() could
        # go backwards (the inverted form of the exact error this class
        # exists to fix). The walk is ~1 ms; serializing it is free.
        with self._lock:
            cur = _tree_cpu_own()
            for pid, c in self._last.items():
                nc = cur.get(pid)
                if nc is None:
                    self._banked += c          # died: bank last-seen CPU
                elif nc < c:
                    self._banked += c          # pid reused: bank old owner
            self._last = cur

    def read(self) -> float:
        self._sample()
        with self._lock:
            return self._banked + sum(self._last.values())


_MONITOR: MonotoneTreeCpu | None = None


def tree_cpu_monotone() -> float:
    """Module-level monotone tree-CPU reading (lazy singleton monitor)."""
    global _MONITOR
    if _MONITOR is None:
        _MONITOR = MonotoneTreeCpu()
    return _MONITOR.read()


#: fixed pure-CPU workload run in a DEDICATED subprocess: ~1.5 s of sha256
#: over 400 MiB. Its CPU-seconds (RUSAGE_SELF, measured by the child
#: itself) are identical instructions every run, so round-over-round drift
#: in the number measures the BOX (hypervisor steal accounting, thermal
#: clamps), never the engine — and, unlike the r8 in-JVM Spark sentinel,
#: it cannot be contaminated by background GC/cleanup CPU from adjacent
#: bench queries in the shared process tree (that contamination produced
#: r9's first-draft 7x within-run sentinel spread).
_HOST_SENTINEL_CODE = (
    "import hashlib, resource\n"
    "b = bytes(1 << 20)\n"
    "h = hashlib.sha256()\n"
    "for _ in range(400):\n"
    "    h.update(b)\n"
    "r = resource.getrusage(resource.RUSAGE_SELF)\n"
    "print(r.ru_utime + r.ru_stime)\n"
)


def _host_sentinel_cpu() -> float | None:
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", _HOST_SENTINEL_CODE],
            capture_output=True, timeout=120, check=True,
        )
        return float(out.stdout.split()[0])
    except Exception:
        return None


def _round_n() -> int:
    """Round number for the self-written BENCH_FULL artifact: the driver
    records BENCH_r{N}.json at the END of round N, so during round N the
    newest driver file is N-1 and this run's artifact is N. Overridable
    via $SPARK_GRAFT_ROUND."""
    import glob
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND", "")
    if env.isdigit():
        return int(env)
    ns = [
        int(m.group(1))
        for path in glob.glob(os.path.join(_REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", path))
    ]
    return max(ns, default=0) + 1


def _load_prev_bench() -> tuple[str, dict] | None:
    """Newest PRIOR-round bench artifact carrying a cpu_sec block.
    BENCH_FULL_r{N} (written directly by this script — r7 VERDICT #3: the
    driver's stdout-capture BENCH_r{N}.json files were tail-truncated two
    rounds running, which silently pinned vs_prev to r5) is preferred over
    the driver wrapper at the same N. Artifacts from the CURRENT round are
    excluded — a second bench run within one round must still compare
    against the previous round, not against its own earlier run."""
    import glob
    import re

    cur = _round_n()
    best_rank, best = (-1, -1), None
    for path in glob.glob(os.path.join(_REPO, "BENCH_r*.json")) + glob.glob(
        os.path.join(_REPO, "BENCH_FULL_r*.json")
    ):
        m = re.search(r"BENCH(_FULL)?_r(\d+)\.json$", path)
        if not m or int(m.group(2)) >= cur:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        # the driver records {n, rc, ..., parsed: <bench json>} wrappers
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        rank = (int(m.group(2)), 1 if m.group(1) else 0)
        if "cpu_sec" in data and rank > best_rank:
            best_rank, best = rank, (os.path.basename(path), data)
    return best


#: a sentinel CPU spread above this means the box's CPU accounting was
#: unstable DURING the run — no single number can calibrate it
_CAL_SPREAD_BOUND = 1.5


def _vs_prev(total: float, cpu: dict[str, float], sf,
             sentinel_block: dict | None = None) -> dict | None:
    prev = _load_prev_bench()
    if prev is None:
        return None
    fname, data = prev
    if data.get("sf") != sf:
        return {"prev": fname, "note": "sf mismatch; ratios omitted",
                "prev_sf": data.get("sf"), "sf": sf}
    prev_cpu = data.get("cpu_sec", {})
    common = sorted(set(cpu) & set(prev_cpu))
    ratios = {
        n: round(cpu[n] / prev_cpu[n], 3)
        for n in common
        if prev_cpu[n] > 0
    }
    cur_tot = sum(cpu[n] for n in common)
    prev_tot = sum(prev_cpu[n] for n in common)
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:3]
    # Host CPU-accounting drift calibration: the sentinel is a FIXED query,
    # so its CPU-seconds moving between rounds measures the box (hypervisor
    # steal accounting, thermal clamps), not the code. An r6 A/B (same r5
    # code tree re-measured in a fresh process) showed 6.8 -> 10.65
    # CPU-seconds on an identical plan — divide the raw ratio by the
    # sentinel ratio before reading anything as a regression.
    #
    # r8 VERDICT #4: a single `cpu_min` sentinel produced a calibrated
    # ratio of 3.399 on a flat-wall run — one number can't calibrate a
    # box whose accounting wobbles WITHIN the run. The protocol is now:
    # median of the interleaved sentinel reps, compared on the SAME basis
    # as the prior artifact (median-to-median once both sides have it,
    # min-to-min against pre-r9 artifacts), and calibration is REFUSED
    # (`calibration_unreliable`) when either side's within-run sentinel
    # spread exceeds the bound.
    sb = sentinel_block or {}
    prev_sb = data.get("noise_sentinel") or {}
    unreliable_reason = None
    if sb.get("host_cpu_median") and prev_sb.get("host_cpu_median"):
        basis = "host_subprocess_median"
        cur_sent = sb["host_cpu_median"]
        prev_sent = prev_sb["host_cpu_median"]
        spreads = [
            s
            for s in (
                sb.get("host_cpu_spread"), prev_sb.get("host_cpu_spread")
            )
            if s is not None
        ]
        if any(s > _CAL_SPREAD_BOUND for s in spreads):
            unreliable_reason = {
                "host_cpu_spread": sb.get("host_cpu_spread"),
                "prev_host_cpu_spread": prev_sb.get("host_cpu_spread"),
                "bound": _CAL_SPREAD_BOUND,
            }
    else:
        # the prior artifact predates the subprocess sentinel; its lone
        # in-JVM cpu_min is the number r8's verdict proved cannot
        # calibrate (3.399 on a flat-wall run) — refuse rather than emit
        # a plausible-looking wrong ratio
        basis = None
        cur_sent = prev_sent = None
        unreliable_reason = {
            "reason": "prev artifact lacks the subprocess host sentinel "
            "(pre-r9); legacy in-JVM cpu_min is not calibration-grade"
        }
    cal = (
        round(cur_sent / prev_sent, 3)
        if cur_sent and prev_sent and unreliable_reason is None
        else None
    )
    out = {
        "prev": fname,
        "common_queries": len(common),
        "cpu_total_ratio": round(cur_tot / prev_tot, 3) if prev_tot else None,
        "host_cpu_calibration": cal,
        "calibration_basis": basis if cal else None,
        "cpu_total_ratio_calibrated": (
            round(cur_tot / prev_tot / cal, 3)
            if prev_tot and cal
            else None
        ),
        "wall_total_ratio": (
            round(total / data["value"], 3) if data.get("value") else None
        ),
        "per_query_cpu_ratio": ratios,
        "worst_cpu_regressions": [
            {"query": n, "ratio": r} for n, r in worst
        ],
    }
    if unreliable_reason is not None:
        out["calibration_unreliable"] = unreliable_reason
    return out


#: r10 VERDICT #7: BENCH_FULL_r10 showed a broad ~1.2x CPU drift that
#: only the host sentinel narrative explained away. Above this bound the
#: artifact carries ``regression: true`` — a real regression can't hide
#: behind "noise" prose; the judge (and the next round's builder) see
#: the flag in the JSON itself.
_REGRESSION_BOUND = 1.15


#: per-query blowup bound: a single query regressing this much (after
#: calibration) trips the wire even when the aggregate stays under
#: _REGRESSION_BOUND — but only above a CPU floor, so a 0.2s query
#: jittering to 0.5s doesn't cry wolf
_QUERY_REGRESSION_BOUND = 2.0
_QUERY_CPU_FLOOR_S = 0.5


def _regression_flag(vs_prev: dict | None,
                     cpu: dict | None = None) -> dict | None:
    """Loud cross-round regression tripwire. Prefers the CALIBRATED
    cpu ratio (host accounting drift divided out); when calibration was
    refused, falls back to the raw ratio and says so — an uncalibrated
    exceedance still demands investigation, not narrative. Also trips
    on any SINGLE query whose calibrated ratio exceeds
    ``_QUERY_REGRESSION_BOUND`` while costing at least
    ``_QUERY_CPU_FLOOR_S`` CPU-seconds this round — an aggregate under
    the total bound must not hide one melted operator."""
    if not vs_prev:
        return None
    ratio = vs_prev.get("cpu_total_ratio_calibrated")
    basis = "cpu_total_ratio_calibrated"
    if ratio is None:
        ratio = vs_prev.get("cpu_total_ratio")
        basis = "cpu_total_ratio"
    if ratio is None:
        return None
    cal = vs_prev.get("host_cpu_calibration") or 1.0
    per_query_hits = [
        {"query": q, "ratio_calibrated": round(r / cal, 3)}
        for q, r in (vs_prev.get("per_query_cpu_ratio") or {}).items()
        if r / cal > _QUERY_REGRESSION_BOUND
        and (cpu or {}).get(q, 0.0) >= _QUERY_CPU_FLOOR_S
    ]
    return {
        "regression": bool(ratio > _REGRESSION_BOUND or per_query_hits),
        "basis": basis,
        "ratio": ratio,
        "bound": _REGRESSION_BOUND,
        "query_hits": per_query_hits,
        "query_bound": _QUERY_REGRESSION_BOUND,
    }


#: the driver-contract stdout keys — nothing else may print (oversized
#: lines were tail-truncated by the driver's capture; see main()).
_CONTRACT_KEYS = ("metric", "value", "unit", "queries", "sf")


def _contract_line(payload: dict) -> str:
    """The ONE stdout line: contract keys only, in contract order."""
    return json.dumps({k: payload[k] for k in _CONTRACT_KEYS})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import get_spark

    spark = get_spark("bench")
    names = [n for n, spec in REGISTRY.items() if spec.bench]

    sentinel_cpus: list[float] = []

    def sentinel() -> float:
        c0 = tree_cpu_monotone()
        t0 = time.time()
        spark.range(2_000_000).selectExpr("sum(id)").collect()
        dt = time.time() - t0
        sentinel_cpus.append(tree_cpu_monotone() - c0)
        return dt

    # Warm-up: run every benchmarked query once (JVM JIT, parquet footers).
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()
    sentinel()

    # Interleave reps round-robin: a transient host-load spike then degrades
    # one rep of every query instead of all reps of one query, so per-query
    # min stays meaningful on a noisy box. The host calibration sentinel
    # (dedicated subprocess, see _HOST_SENTINEL_CODE) interleaves the same
    # way so its median samples the same run window as the queries.
    best: dict[str, float] = {n: float("inf") for n in names}
    best_cpu: dict[str, float] = {n: float("inf") for n in names}
    sentinels: list[float] = []
    host_cpus: list[float] = []
    for _ in range(5):
        sentinels.append(sentinel())
        if (h := _host_sentinel_cpu()) is not None:
            host_cpus.append(h)
        for name in names:
            c0 = tree_cpu_monotone()
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            best[name] = min(best[name], time.time() - t0)
            best_cpu[name] = min(best_cpu[name], tree_cpu_monotone() - c0)
    sentinels.append(sentinel())
    if (h := _host_sentinel_cpu()) is not None:
        host_cpus.append(h)
    timings = {n: round(v, 3) for n, v in best.items()}
    cpu = {n: round(v, 3) for n, v in best_cpu.items()}

    total = round(sum(timings.values()), 3)
    s_min, s_max = min(sentinels), max(sentinels)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # calibration sentinel: median + within-run spread of the >=5
    # interleaved DEDICATED-subprocess reps; the spread gates whether
    # cross-round calibration is trusted at all
    import statistics

    sentinel_block = {
        "min": round(s_min, 4),
        "max": round(s_max, 4),
        "spread": round(s_max / s_min, 2) if s_min > 0 else None,
        "cpu_min": round(min(sentinel_cpus), 4),
    }
    if host_cpus:
        sentinel_block.update(
            host_cpu_median=round(statistics.median(host_cpus), 4),
            host_cpu_spread=(
                round(max(host_cpus) / min(host_cpus), 2)
                if min(host_cpus) > 0
                else None
            ),
            host_cpu_reps=len(host_cpus),
            host_workload="sha256-400MiB-subprocess",
        )
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cpu_sec": cpu,
        "cpu_total": round(sum(cpu.values()), 3),
        "noise_sentinel": sentinel_block,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "vs_prev": _vs_prev(
            total,
            cpu,
            float(sf) if sf.replace(".", "").isdigit() else sf,
            sentinel_block=sentinel_block,
        ),
    }
    if (reg := _regression_flag(payload["vs_prev"], cpu)) is not None:
        payload["regression"] = reg["regression"]
        payload["regression_detail"] = reg
    # Driver contract line — MINIMAL on purpose (r18, VERDICT r17 next #2):
    # the oversized single line was tail-truncated by the driver's stdout
    # capture two rounds running (BENCH_r16.json parsed: null, which
    # emptied the r17 PERF round-over-round table). Only the contract keys
    # (metric/value/unit/queries/sf) print; the full payload (cpu_sec,
    # noise_sentinel, vs_prev, regression_detail) is FILE-ONLY below.
    # The timed .count() action, the wall methodology and the query set
    # are unchanged — this is an output-framing fix, not a re-measure.
    print(_contract_line(payload))
    # The FILE is the durable full artifact. The env-less default-SF run is
    # the round-comparable one (BENCH_FULL_r{N}); a run pointed anywhere
    # via $SPARK_GRAFT_SF_DIR (sf0.01 iteration, the driver's own capture)
    # writes a scratch side file instead so the full payload is never lost
    # and the round artifact is never clobbered.
    if "SPARK_GRAFT_SF_DIR" not in os.environ:
        out = os.path.join(_REPO, f"BENCH_FULL_r{_round_n():02d}.json")
    else:
        out = os.path.join(_REPO, "BENCH_FULL_LAST.json")
    try:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
    except OSError:
        pass  # read-only checkout — the contract line already printed
    spark.stop()


if __name__ == "__main__":
    main()
