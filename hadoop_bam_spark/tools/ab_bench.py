"""Cross-round interleaved A/B bench: is a perf delta CODE or HOST?

The one protocol that settled r13's 3-round "ratchet" dispute
(AB_CROSSROUND_r14.json), committed as a tool so the next drift
question is one command:

    python -m hadoop_bam_spark.tools.ab_bench <refA> [<refB>]
        [--pairs=5] [--sf-dir=DIR] [--queries=a,b,c] [--json=OUT.json]
        [--spread-bound=1.25] [--keep-worktrees]

- ``refA`` (and ``refB``, when given) are git refs, materialized as
  detached worktrees under /tmp — the exact committed trees, no
  reinstalls (pure-Python engine). ``refB`` defaults to the LIVE repo
  directory including uncommitted changes (the thing you are about to
  ship).
- Reps run INTERLEAVED in A,B,A,B,... pairs, each rep a FRESH
  subprocess (fresh JVM — no cross-tree JIT/GC contamination), in one
  session, so host drift degrades both trees equally instead of
  whichever ran second. Each rep warms every query once, then measures
  per-query PROCESS-TREE CPU seconds (steal-invisible, the same basis
  as bench.py's cpu_sec).
- The fixed sha256 host sentinel (bench.py's subprocess workload) runs
  between pairs: its spread bounds how much the BOX wobbled during the
  session, and its absolute level compares against prior rounds'
  BENCH_FULL artifacts.
- Verdict: B/A ratio of median cpu totals over the SHARED query set.
  FLAT when the ratio sits inside the within-session spread; otherwise
  the delta is code (or at least survives the host-noise defense).

Queries default to the bench-flagged sets' intersection of the two
trees (a query renamed/added between rounds drops out rather than
skewing the total).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

#: runner executed per rep in a fresh subprocess with cwd=<tree>.
#: argv: <sf_dir> <mode> [query,query,...]; mode "names" prints the
#: tree's bench-flagged query names, mode "run" times the given set.
_RUNNER = r"""
import json, os, sys, threading, time as _time
sys.path.insert(0, os.getcwd())
_CLK = os.sysconf("SC_CLK_TCK")

def _tree_own():
    procs = {}
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
            procs[int(entry)] = (int(rest[1]),
                                 (int(rest[11]) + int(rest[12])) / _CLK)
        except (IndexError, ValueError):
            continue
    me, out = os.getpid(), {}
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

# Monotone tree-CPU: bank a pid's last-seen own-CPU when it disappears (or
# its counter rewinds = pid reuse); never read cutime, so nothing is
# double-counted and a dying unreaped worker cannot make a delta negative.
_lock, _last, _banked = threading.Lock(), {}, [0.0]

def _sample():
    # /proc walk under the lock too: an interleaved older snapshot would
    # overwrite a newer _last after a death was banked (double-count).
    with _lock:
        cur = _tree_own()
        for pid, c in _last.items():
            nc = cur.get(pid)
            if nc is None or nc < c:
                _banked[0] += c
        _last.clear(); _last.update(cur)

def _loop():
    while True:
        _time.sleep(0.25); _sample()

threading.Thread(target=_loop, daemon=True).start()

def tree_cpu():
    _sample()
    with _lock:
        return _banked[0] + sum(_last.values())

sf_dir, mode = sys.argv[1], sys.argv[2]
from hadoop_bam_spark.queries import REGISTRY
if mode == "names":
    print(json.dumps(sorted(n for n, s in REGISTRY.items() if s.bench)))
    sys.exit(0)
names = sys.argv[3].split(",")
from hadoop_bam_spark.session import get_spark
spark = get_spark("ab_bench")
for n in names:
    REGISTRY[n].fn(spark, sf_dir).count()  # warm: JVM JIT, footers
out = {}
for n in names:
    c0 = tree_cpu()
    REGISTRY[n].fn(spark, sf_dir).count()
    out[n] = round(tree_cpu() - c0, 3)
print(json.dumps(out))
spark.stop()
"""

_HOST_SENTINEL = (
    "import hashlib, resource\n"
    "b = bytes(1 << 20)\n"
    "h = hashlib.sha256()\n"
    "for _ in range(400):\n"
    "    h.update(b)\n"
    "r = resource.getrusage(resource.RUSAGE_SELF)\n"
    "print(r.ru_utime + r.ru_stime)\n"
)


def _sh(args: list[str], cwd: str | None = None) -> str:
    return subprocess.run(
        args, cwd=cwd or _REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _materialize(ref: str) -> tuple[str, str]:
    """Resolve ref -> (label, tree directory). The live-repo sentinel
    refs ('.', 'LIVE') use the working tree as-is; anything else gets a
    detached git worktree under a USER-PRIVATE (0700) directory — a
    predictable name in world-writable /tmp could hand the runner
    subprocess someone else's code — and a reused worktree is verified
    to be the expected checkout (``git rev-parse HEAD`` must match;
    stale/foreign trees are recreated, not silently benchmarked)."""
    if ref in (".", "LIVE"):
        return "live", _REPO
    sha = _sh(["git", "rev-parse", "--short", ref])
    full = _sh(["git", "rev-parse", ref])
    parent = os.path.join(
        tempfile.gettempdir(), f"ab_bench_u{os.getuid()}"
    )
    os.makedirs(parent, mode=0o700, exist_ok=True)
    os.chmod(parent, 0o700)
    path = os.path.join(parent, f"ab_bench_{sha}")
    if os.path.isdir(path):
        try:
            head = _sh(["git", "rev-parse", "HEAD"], cwd=path)
        except subprocess.CalledProcessError:
            head = None
        if head != full:
            try:
                _sh(["git", "worktree", "remove", "--force", path])
            except subprocess.CalledProcessError:
                # not a valid worktree of this repo (foreign/corrupt):
                # clear it by hand and let git forget any stale entry
                import shutil

                shutil.rmtree(path, ignore_errors=True)
                _sh(["git", "worktree", "prune"])
            _sh(["git", "worktree", "add", "--detach", path, sha])
    else:
        _sh(["git", "worktree", "add", "--detach", path, sha])
    return sha, path


def _rep(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, sf_dir, "run", ",".join(names)],
        cwd=tree, capture_output=True, text=True, check=True,
        env={**os.environ, "PYTHONPATH": tree},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _bench_names(tree: str, sf_dir: str) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, sf_dir, "names"],
        cwd=tree, capture_output=True, text=True, check=True,
        env={**os.environ, "PYTHONPATH": tree},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _host_cpu() -> float | None:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _HOST_SENTINEL],
            capture_output=True, timeout=120, check=True,
        )
        return float(out.stdout.split()[0])
    except Exception:
        return None


def summarize(
    reps_a: list[dict[str, float]],
    reps_b: list[dict[str, float]],
    label_a: str,
    label_b: str,
    sentinels: list[float],
    spread_bound: float,
) -> dict:
    """Pure A/B math over interleaved rep samples — median-of-medians
    ratio, within-session spreads, flat-or-not verdict. Separated from
    the process plumbing so it is unit-testable."""
    names = sorted(set(reps_a[0]) & set(reps_b[0]))
    tot_a = [sum(r[n] for n in names) for r in reps_a]
    tot_b = [sum(r[n] for n in names) for r in reps_b]
    med_a, med_b = statistics.median(tot_a), statistics.median(tot_b)
    ratio = round(med_b / med_a, 3) if med_a else None
    spread_a = round(max(tot_a) / min(tot_a), 3) if min(tot_a) > 0 else None
    per_query = {}
    outliers = []
    for n in names:
        qa = [r[n] for r in reps_a]
        qb = [r[n] for r in reps_b]
        qma, qmb = statistics.median(qa), statistics.median(qb)
        qratio = round(qmb / qma, 3) if qma else None
        # the query's OWN within-session spread (the total's spread is
        # far tighter — per-query noise would read as fake regressions
        # against it, and real per-query deltas hid inside prose before
        # r16: the verdict is now computed, not narrated)
        q_spread = round(max(qa) / min(qa), 3) if min(qa) > 0 else None
        if qratio is None or q_spread is None:
            q_verdict = "n/a"
        elif qratio <= max(spread_bound, q_spread) and 1 / qratio <= max(
            spread_bound, q_spread
        ):
            q_verdict = "flat"
        else:
            q_verdict = "outlier"
            outliers.append(n)
        per_query[n] = {
            f"{label_a}_median": qma,
            f"{label_b}_median": qmb,
            "ratio": qratio,
            "within_session_spread": q_spread,
            "verdict": q_verdict,
        }
    flat = ratio is not None and spread_a is not None and ratio <= max(
        spread_bound, spread_a
    ) and 1 / ratio <= max(spread_bound, spread_a)
    verdict = (
        f"CODE IS FLAT: {label_b}/{label_a} = {ratio} (median cpu totals), "
        f"inside the within-session spread {spread_a} (bound {spread_bound})"
        if flat
        else f"DELTA SURVIVES HOST-NOISE DEFENSE: {label_b}/{label_a} = "
        f"{ratio} vs within-session spread {spread_a} (bound {spread_bound})"
    )
    out = {
        "protocol": "tools/ab_bench.py interleaved rep-pairs, fresh "
        "subprocess per rep, process-tree CPU seconds, sha256 host "
        "sentinel between pairs (the AB_CROSSROUND_r14 protocol)",
        f"cpu_total_{label_a}": [round(t, 2) for t in tot_a],
        f"cpu_total_{label_b}": [round(t, 2) for t in tot_b],
        f"cpu_total_median_{label_a}": round(med_a, 2),
        f"cpu_total_median_{label_b}": round(med_b, 2),
        f"{label_b}_vs_{label_a}_median_ratio": ratio,
        f"within_session_spread_{label_a}": spread_a,
        "per_query": per_query,
        "per_query_outliers": sorted(outliers),
        "flat": flat,
        "verdict": verdict
        + (
            f"; {len(outliers)} per-query outlier(s) beyond their own "
            f"within-session spread: {sorted(outliers)}"
            if outliers
            else "; every per-query ratio inside its own within-session "
            "spread"
        ),
    }
    if sentinels:
        out["host_sentinel_session_range"] = [
            round(min(sentinels), 4), round(max(sentinels), 4),
        ]
        out["host_sentinel_spread"] = (
            round(max(sentinels) / min(sentinels), 3)
            if min(sentinels) > 0
            else None
        )
    return out


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    opts = dict(
        a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), "1")
        for a in argv
        if a.startswith("--")
    )
    if not args:
        print(__doc__)
        return 2
    ref_a = args[0]
    ref_b = args[1] if len(args) > 1 else "."
    pairs = int(opts.get("pairs", "5"))
    sf_dir = opts.get("sf-dir", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    spread_bound = float(opts.get("spread-bound", "1.25"))
    label_a, tree_a = _materialize(ref_a)
    label_b, tree_b = _materialize(ref_b)
    if opts.get("queries"):
        names = sorted(opts["queries"].split(","))
    else:
        names = sorted(
            set(_bench_names(tree_a, sf_dir)) & set(_bench_names(tree_b, sf_dir))
        )
    print(f"# A={label_a} ({tree_a})  B={label_b} ({tree_b})  "
          f"{len(names)} shared queries, {pairs} interleaved pairs",
          file=sys.stderr)
    reps_a, reps_b, sentinels = [], [], []
    for i in range(pairs):
        if (h := _host_cpu()) is not None:
            sentinels.append(h)
        reps_a.append(_rep(tree_a, sf_dir, names))
        reps_b.append(_rep(tree_b, sf_dir, names))
        print(f"# pair {i + 1}/{pairs} done", file=sys.stderr)
    if (h := _host_cpu()) is not None:
        sentinels.append(h)
    result = summarize(reps_a, reps_b, label_a, label_b, sentinels, spread_bound)
    result["refs"] = {label_a: ref_a, label_b: ref_b}
    result["sf_dir"] = sf_dir
    print(json.dumps(result, indent=1))
    if opts.get("json"):
        with open(opts["json"], "w") as fh:
            json.dump(result, fh, indent=1)
    if "keep-worktrees" not in opts:
        for label, tree in ((label_a, tree_a), (label_b, tree_b)):
            if tree != _REPO:
                _sh(["git", "worktree", "remove", "--force", tree])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
