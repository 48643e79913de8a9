#!/bin/bash
# Canonical solo-probe ledger (PLANS r13 policy): isolated FRESH-JVM
# bench probes for the top marginal queries, repeat=3, one query per
# JVM, written to PROBES.json. Round-over-round perf comparison is
# SOLO-TO-SOLO against this ledger; the driver full sweep is a sanity
# total only — sweep-to-sweep deltas proved unadjudicatable three
# rounds running (residency/host drift inflates whole sweeps 15-25%
# with zero plan changes; PLANS r10-r12 adjudications).
#
# Usage: dev/run_probes.sh <round> [sfDir] [outFile] [queries...]
#   dev/run_probes.sh 13                      # top-15 list, sf0.1
#   dev/run_probes.sh 13 /root/testdata/sf0.1 PROBES.json q91 q88
#
# Refresh rule: run TWICE per round on the round's final tree (quiet
# host, no concurrent JVMs — check `ps` first); same-round re-runs
# merge by per-query MIN across passes, because single-thread calib
# cannot see 32-way host throttling (r13: clean 0.38 calib alongside
# 2-4x inflated parallel readings in one pass). The TOP15 list below
# tracks the driver bench's top marginals and grows as new heavy
# queries land.
set -e
cd /root/repo
ROUND=${1:?round number (e.g. 13)}
SF=${2:-/root/testdata/sf0.1}
OUT=${3:-PROBES.json}
shift || true; shift || true; shift || true
# top-15 by BENCH_r12 driver marginal (the r13 base selection)
# q111 joined r13 at 3.77 s isolated — top-8 territory
# q114 (fixpoint loop, 2.64 s) and q116 (grouped rank engine, 3.16 s) joined r14
# q118/q119/q120 (rank-engine consumers + the quantile index readers,
# ~3.1/3.4/3.5 s first-pass solos) joined late r14; q117 stays off the
# list at 0.75 s; q121 (rank-engine selection, 2.92 s solo) joined
# after the r14 refresh — first ledger row lands with the r15 pass
# q124 (grouped sketch over one tokenize pass) and q125 (the cube's
# finest-grain drift reader) joined r15; q122/q123 stay off the list
# (dispatchers whose live branch is the cheap bounded formulation)
# q101/q103 joined r16 (the funnel pair was the one sweep-adjudication
# class with no solo anchor — r15 verdict wrong #3); q126 joined r16
# (the retraction lane's driver row — q119's read over the retracted
# fixture, rqidx cache tier)
# q127 (row-store retraction row, rbandidx tier) formalized r17 after
# its first r16 rows; q128 (event-tier retraction row, rretidx tier)
# joined r17; q14/q19/q20 joined r17 to anchor the r16 verdict's three
# sub-second sweep movers (the fixed-overhead noise class — one solo
# row each closes them for good, the q101 precedent)
TOP15="q91 q88 q102 q99 q110 q98 q66 q74 q76 q97 q72 q22 q95 q51 q87 q101 q103 q111 q114 q116 q118 q119 q120 q121 q124 q125 q126 q127 q128 q14 q19 q20"
QUERIES=${*:-$TOP15}

if pgrep -f "^java .*graft\.(Bench|Verify)" >/dev/null; then
  echo "another bench/verify JVM is running — refusing to probe" >&2; exit 1
fi

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
# Sweep count: 3 by default; raise (e.g. REPEAT=8) for a follow-up pass
# on a JIT-latency-bound query whose 3-sweep min never reaches steady
# state on a slow host — the r14 q91 adjudication: 3 sweeps read 7.6 s
# on a 0.43-calib host, 8 sweeps recovered the true 3.8 s; same-round
# min-merge absorbs the longer pass without touching other rows.
REPEAT=${REPEAT:-3}
for q in $QUERIES; do
  echo "probe $q ..." >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=$REPEAT \
  SPARK_GRAFT_ONLY=$q \
    java $ADD_OPENS -Xmx24g -Xms24g -cp "$CP" \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      graft.Bench 2>/dev/null | grep '"metric"' > "$TMP/$q.json"
done

python3 - "$ROUND" "$SF" "$OUT" "$TMP" $QUERIES <<'EOF'
import json, sys, os
round_n, sf, out, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
queries = sys.argv[5:]
prev_doc = {}
if os.path.exists(out):
    with open(out) as f:
        prev_doc = json.load(f)
prev = prev_doc.get("probes", {})
same_round = prev_doc.get("round") == round_n
# PRESERVE rows for queries not probed in this invocation — a partial
# re-probe (the q91-style follow-up) must never drop the rest of the
# ledger (r14 postmortem: a single-query pass rewrote the doc to one
# row and lost the round's full merge). Same-round rows stay verbatim;
# cross-round leftovers keep their old reading and are distinguishable
# by the per-row "round" stamp written below.
probes = {q: dict(p) for q, p in prev.items()}
# Rows written before the per-row "round" stamp existed carry no
# attribution; backfill from the old doc-level round so every carried
# row is distinguishable from this round's readings.
for p in probes.values():
    p.setdefault("round", prev_doc.get("round"))
for q in queries:
    with open(f"{tmp}/{q}.json") as f:
        b = json.loads(f.read().strip())
    sec = b["queries"][q] / 100.0                 # min of 3 sweeps, fresh JVM
    p = {
        "sec": sec,
        "calib": b["calib"],                      # ~0.40 = clean single-thread
        "cache_sec": {k: v / 100.0 for k, v in b.get("cache", {}).items()},
        "prev_sec": prev.get(q, {}).get("prev_sec") if same_round
                    else prev.get(q, {}).get("sec"),
    }
    # Same-round re-run: keep the MIN across fresh-JVM ledger passes.
    # Single-thread calib cannot see 32-way host throttling (a clean
    # 0.38 calib coexisted with 2-4x inflated parallel readings, r13),
    # so the refresh protocol is: run the ledger TWICE per round; a
    # query whose two passes disagree >1.5x was throttled in one of
    # them and the min is the clean reading.
    if same_round and q in prev and prev[q].get("sec", 1e9) < sec:
        p["sec"] = prev[q]["sec"]
        p["calib"] = prev[q]["calib"]
        p["cache_sec"] = prev[q]["cache_sec"]
    p["round"] = round_n
    probes[q] = p
doc = {
    "round": round_n,
    "sf": os.path.basename(sf),
    "method": ("per-query isolated probe: fresh JVM, SPARK_GRAFT_ONLY=<q>, "
               "repeat=3 interleaved sweeps (min), CPUS=32, 24g fixed heap, "
               "quiet host (calib ~0.40); shared caches the query consumes "
               "are built first and billed to cache_sec, so sec is the "
               "query's MARGINAL cost"),
    "policy": ("round-over-round comparison is solo-to-solo against this "
               "ledger (prev_sec carries the last refresh); the driver "
               "full-sweep BENCH_r*.json is a sanity total only"),
    "probes": probes,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"wrote {out}: " + ", ".join(f"{q}={probes[q]['sec']:.2f}s" for q in queries))
EOF
