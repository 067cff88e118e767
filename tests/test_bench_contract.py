"""bench.py contract pins (VERDICT r3 items 3 + 6).

The harness has three driver-facing promises:
  1. HEADLINE only references registered queries (renames would break
     the nightly bench) — also covered in test_docs_coverage.
  2. The stated selection rule ("cover every operator family") is a
     checked property, not prose: every module that registers queries
     has at least one headline representative, and --full covers the
     whole registry by construction.
  3. The --gate regression mode actually catches an injected slowdown
     and does not cry wolf on jitter.

These are session-free tests (pure functions + registry metadata).
"""

import bench
from streams_prototyping_spark import registry


def _loaded():
    registry.load_all()
    return registry.QUERIES


def test_headline_subset_of_registry():
    qs = _loaded()
    unknown = [q for q in bench.HEADLINE if q not in qs]
    assert unknown == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"


def test_gate_baseline_covers_headline():
    """VERDICT r8 item 4: the latest committed per-query gate baseline
    must cover the CURRENT headline set exactly — a headline query the
    baseline lacks is invisible to the regression gate until the next
    re-baseline (the r7/r8 lag class). Whoever extends HEADLINE owes a
    re-baseline (two idle runs, commit the second) in the same round."""
    import json
    import re
    from pathlib import Path

    here = Path(bench.__file__).parent
    baselines = sorted(
        here.glob("BENCH_GATE_BASELINE_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert baselines, "no committed gate baseline"
    latest = baselines[-1]
    prev = json.loads(latest.read_text()).get("queries", {})
    missing = sorted(set(bench.HEADLINE) - set(prev))
    extra = sorted(set(prev) - set(bench.HEADLINE))
    assert missing == [] and extra == [], (
        f"{latest.name} vs HEADLINE: missing={missing} extra={extra}"
    )


def test_headline_covers_every_query_module():
    """The selection rule's 'one representative per operator family'
    claim, pinned at module granularity."""
    qs = _loaded()
    by_module: dict = {}
    for name, fn in qs.items():
        by_module.setdefault(fn.__module__, []).append(name)
    headline = set(bench.HEADLINE)
    bare = {
        m: names
        for m, names in by_module.items()
        if not headline.intersection(names)
    }
    assert bare == {}, f"query modules without a headline representative: {bare}"


def test_headline_has_each_modules_most_expensive():
    """VERDICT r7 item 4: the family-most-expensive rule, checked
    against the COMMITTED full-bench timings instead of prose. For
    every query module, the most expensive registered member (per
    BENCH_LOCAL_FULL.json) must be headline — with a jitter guard: a
    non-headline member may out-time the module's headline max only
    within 1.3x + 0.3 s (two near-equal siblings can swap places
    between rounds without both being headline). Queries newer than
    the committed artifact have no timing yet and are exempt until the
    next --full refresh records them."""
    import json
    from pathlib import Path

    full_path = Path(bench.__file__).parent / "BENCH_LOCAL_FULL.json"
    full = json.loads(full_path.read_text())["queries"]
    qs = _loaded()
    headline = set(bench.HEADLINE)
    by_module: dict = {}
    for name, fn in qs.items():
        if name in full:
            by_module.setdefault(fn.__module__, []).append(name)
    offenders = {}
    for mod, names in by_module.items():
        head_times = [full[n] for n in names if n in headline]
        if not head_times:
            # ADVICE r8: a module whose headline members are all newer
            # than the committed artifact has no baseline — treating
            # the missing timing as 0.0 would falsely flag every
            # non-headline sibling over 0.3 s. The module-coverage
            # test above still guarantees a headline member exists;
            # this rule resumes at the next --full refresh.
            continue
        head_max = max(head_times)
        for n in names:
            if n not in headline and full[n] > 1.3 * head_max + 0.3:
                offenders[n] = {
                    "module": mod,
                    "sec": full[n],
                    "headline_max": head_max,
                }
    assert offenders == {}, (
        "registered queries exceed their module's headline member at the "
        f"committed full-bench timings (add them to HEADLINE): {offenders}"
    )


def test_full_mode_is_whole_registry():
    """--full benches sorted(registry.QUERIES) — nothing silently
    dropped (the 'no silent caps' rule). The mode reads the registry at
    run time, so this pin only needs the sets to be derivable."""
    qs = _loaded()
    assert set(bench.HEADLINE) <= set(qs)
    # the full map strictly extends headline (the registry is bigger)
    assert len(qs) > len(bench.HEADLINE)


def test_gate_passes_on_identical_and_improved_runs():
    prev = {"a": 2.0, "b": 0.4, "c": 10.0}
    assert bench.compare_gate(prev, prev)["ok"]
    faster = {"a": 1.0, "b": 0.3, "c": 5.0}
    rep = bench.compare_gate(faster, prev)
    assert rep["ok"] and rep["violations"] == []


def test_gate_catches_injected_slowdown():
    prev = {"a": 2.0, "b": 0.4, "c": 10.0}
    slow = dict(prev, c=31.0)  # 3.1x on a 10 s query
    rep = bench.compare_gate(slow, prev)
    assert not rep["ok"]
    assert [v["query"] for v in rep["violations"]] == ["c"]
    assert rep["violations"][0]["ratio"] == 3.1


def test_gate_ignores_subsecond_jitter_but_not_total_drift():
    prev = {"a": 0.1, "b": 0.2}
    jitter = {"a": 0.3, "b": 0.4}  # 3x/2x but < noise_s absolute
    rep = bench.compare_gate(jitter, prev)
    assert rep["violations"] == []
    # total_ok: 0.7 vs 0.3 is >1.2x but within the absolute noise slack
    assert rep["ok"]
    # a real total drift (many queries each slightly slower, sum >noise)
    prev2 = {f"q{i}": 1.0 for i in range(20)}
    drift = {f"q{i}": 1.45 for i in range(20)}  # each under per-query 1.5x
    rep2 = bench.compare_gate(drift, prev2)
    assert rep2["violations"] == [] and not rep2["total_ok"] and not rep2["ok"]


def test_gate_only_compares_shared_queries():
    prev = {"a": 1.0, "gone": 5.0}
    fresh = {"a": 1.1, "new": 50.0}
    rep = bench.compare_gate(fresh, prev)
    assert rep["n_shared"] == 1 and rep["ok"]


def test_gate_flags_stale_fast_baseline():
    """VERDICT r6 item 3: drift symmetry. A green run far BELOW the
    baseline (box/code now much faster) silently widens the tolerated
    regression — the gate must flag it for re-baselining, without
    failing (fast is not a regression)."""
    prev = {f"q{i}": 1.0 for i in range(20)}
    fast = {f"q{i}": 0.8 for i in range(20)}  # ratio 0.8 < drift_low 0.9
    rep = bench.compare_gate(fast, prev)
    assert rep["ok"]  # green: nothing regressed
    assert rep["stale_baseline"]
    assert "re-baseline" in rep["stale_note"]
    # mildly-faster runs do not nag
    mild = {f"q{i}": 0.95 for i in range(20)}
    rep2 = bench.compare_gate(mild, prev)
    assert rep2["ok"] and not rep2["stale_baseline"]
    # identical runs neither
    assert not bench.compare_gate(prev, prev)["stale_baseline"]
    # a near-zero fresh total (ratio rounds to 0.0) must not divide by
    # zero inside the stale note (ADVICE r7) — and 0.0 is not "stale",
    # it is a broken measurement
    tiny = {f"q{i}": 0.0001 for i in range(20)}
    rep3 = bench.compare_gate(tiny, prev)
    assert rep3["ok"] and not rep3["stale_baseline"]


def test_load_evidence_shape():
    """VERDICT r9 item 5: ambient load must be a FIELD, not adjudicated
    prose. The snapshot must carry the loadavg triple, CPU count, and
    the competing-process view, with sane types — and the bench's own
    process tree must never count as competing."""
    ev = bench.read_load_evidence()
    for k in ("load1", "load5", "load15"):
        assert isinstance(ev[k], float) and ev[k] >= 0.0, (k, ev)
    assert isinstance(ev["ncpus"], int) and ev["ncpus"] >= 1
    assert isinstance(ev["n_competing"], int) and ev["n_competing"] >= 0
    assert isinstance(ev["competing_top"], list)
    assert len(ev["competing_top"]) <= 5
    import os

    me = os.getpid()
    assert all(c["pid"] != me for c in ev["competing_top"])


def test_ambient_loaded_rule():
    """The machine-checkable 'ambient' decision: pre-bench load1 above
    the threshold, or a competing process in ANY snapshot."""
    idle = {"load1": 0.2, "load5": 0.3, "n_competing": 0}
    loaded = {"load1": bench.AMBIENT_LOAD1 + 1, "load5": 0.3, "n_competing": 0}
    # the tail-of-work case (round 4 / round 10): load1 already decayed
    # but load5 still carries the just-finished job — page cache dirty
    tail = {"load1": 0.1, "load5": bench.AMBIENT_LOAD1 + 2, "n_competing": 0}
    rival = {"load1": 0.2, "load5": 0.3, "n_competing": 1}
    assert not bench.is_ambient_loaded(idle, idle)
    assert bench.is_ambient_loaded(loaded, idle)
    assert bench.is_ambient_loaded(tail, idle)
    assert bench.is_ambient_loaded(idle, rival)  # rival seen post-run
    # high load in a LATER snapshot alone is the bench's own work, not
    # ambient — only the PRE snapshot's loadavg decides those clauses
    assert not bench.is_ambient_loaded(idle, loaded | {"n_competing": 0})
    assert not bench.is_ambient_loaded()



def test_gate_artifact_carries_load_evidence():
    """The committed gate artifact must include the evidence block the
    r9 verdict asked for — pre AND post snapshots plus the machine
    verdict — so 'ambient' is reviewable from the artifact alone."""
    import json
    from pathlib import Path

    doc = json.loads(
        (Path(bench.__file__).parent / "BENCH_GATE_LATEST.json").read_text()
    )
    ev = doc["load_evidence"]
    for snap in ("pre", "post"):
        assert {"load1", "load5", "load15", "ncpus", "n_competing"} <= set(
            ev[snap]
        ), snap
    assert isinstance(doc["ambient_loaded"], bool)
    assert doc["ambient_load1_threshold"] == bench.AMBIENT_LOAD1
    # a violated run on a loaded box must have auto-rerun exactly once
    if not doc["ok"] and doc["ambient_loaded"]:
        assert "auto_rerun" in doc and "first_attempt" in doc["auto_rerun"]


def test_proc_cpu_sample_shape():
    """The instantaneous-CPU sampler (ADVICE r10: ps pcpu is a lifetime
    average) must see this very process with sane fields."""
    import os

    s = bench._proc_cpu_sample()
    me = os.getpid()
    assert me in s
    ppid, ticks, comm = s[me]
    assert isinstance(ppid, int) and ppid >= 0
    assert isinstance(ticks, int) and ticks >= 0
    assert "python" in comm or comm  # comm parsed, non-empty


def test_headline_artifact_carries_load_evidence():
    """VERDICT r10 item 3: the committed headline/full artifacts (not
    just the gate file) must self-adjudicate ambient load — evidence
    block, machine verdict, and, when an auto-rerun fired, the rerun's
    own separately-adjudicated snapshots."""
    import json
    from pathlib import Path

    doc = json.loads(
        (Path(bench.__file__).parent / "BENCH_LOCAL_LATEST.json").read_text()
    )
    ev = doc["load_evidence"]
    for snap in ("pre", "post"):
        assert {"load1", "load5", "load15", "ncpus", "n_competing"} <= set(
            ev[snap]
        ), snap
    assert isinstance(doc["ambient_loaded"], bool)
    assert doc["ambient_load1_threshold"] == bench.AMBIENT_LOAD1
    if "ambient_rerun" in doc:
        assert {"rerun_pre", "rerun_post"} <= set(ev)
        assert isinstance(doc["rerun_ambient_loaded"], bool)
        assert "first_total_s" in doc["ambient_rerun"]


def test_budgeted_summary_contract():
    """VERDICT r11 item 2: the stdout line must (a) never drop a query
    the previous driver artifact reported (no phantom
    dropped_from_bench), (b) stay inside the driver's measured
    2000-char tail buffer, (c) add as many current-slowest entries as
    fit."""
    import json

    # synthetic full map: every prev-reported query + 156 fillers
    timings = {q: 2.0 + i / 100 for i, q in enumerate(bench.PREV_REPORTED)}
    timings.update({f"filler_query_with_a_long_name_{i:03d}": 1.0 for i in range(156)})
    base = {
        "metric": "headline_queries_total_runtime",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(timings),
        "_full_name": "BENCH_LOCAL_LATEST.json",
        "load_evidence": {
            "pre": {"load1": 1.0, "load5": 1.0, "load15": 1.0,
                    "ncpus": 32, "n_competing": 0},
            "post": {"load1": 9.0, "load5": 7.0, "load15": 5.0,
                     "ncpus": 32, "n_competing": 0},
        },
        "ambient_loaded": False,
    }
    out = bench.budgeted_summary(base, timings)
    line = json.dumps(out)
    assert len(line) <= bench.LINE_BUDGET
    assert set(bench.PREV_REPORTED) <= set(out["queries"])
    assert len(out["queries"]) > len(bench.PREV_REPORTED)  # slowest fill in
    assert "_full_name" not in out
    # a prev-reported query missing from the registry map (real removal)
    # simply doesn't appear — no KeyError
    t2 = dict(timings)
    t2.pop(bench.PREV_REPORTED[0])
    out2 = bench.budgeted_summary(base, t2)
    assert bench.PREV_REPORTED[0] not in out2["queries"]


def test_headline_artifact_carries_stage_build_sec():
    """VERDICT r11 item 3: committed bench artifacts publish per-shared-
    stage build seconds so warm-up cost-shifting is visible."""
    import json
    from pathlib import Path

    doc = json.loads(
        (Path(bench.__file__).parent / "BENCH_LOCAL_LATEST.json").read_text()
    )
    sbs = doc["stage_build_sec"]
    assert isinstance(sbs, dict) and sbs, "stage_build_sec missing/empty"
    # the five r11 stages the verdict flagged must be visible
    for tag in ("pq_codes", "ivfpq_routing_cent", "bpe_merge_table",
                "dedup/simhash_fp", "similarity/exact_topk"):
        assert tag in sbs, tag
    assert all(isinstance(v, float) for v in sbs.values())
