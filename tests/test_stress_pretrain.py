"""CI-scale run of the composed pretrain-chain stress harness.

tools/stress_pretrain.py exists for 1-10M-doc probes (BENCH.md records
those); this runs the IDENTICAL chain + closed-form model at 5k docs so
the nine invariants — planted-pair graph exactness, CC survivor count,
decontaminate-drops-nothing, rebalanced row count against the
md5-mirrored copy model, train-split row count, packed token total,
stream end, pack-span sum, max pack id — gate every future change to any
stage of the chain, not just the stages with individual oracles."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from stress_pretrain import model, run_stress  # noqa: E402


def test_chain_invariants_at_ci_scale(spark):
    out = run_stress(spark, 5000, budget=128)
    assert out["all_green"], out["checks"]
    # the fixture is non-degenerate: dups planted, eval carved, copies
    # both up- and downsampled, documents straddle pack boundaries
    exp = out["expected"]
    assert exp["n_dups"] == 500
    assert exp["n_eval"] > 0
    assert exp["n_rebalanced"] != exp["n_train"]  # rebalance changed rows
    assert exp["sum_n_packs"] > exp["n_train_split"]  # straddles exist


def test_model_is_deterministic_and_scales():
    a, b = model(2000), model(2000)
    assert a == b
    big = model(4000)
    assert big["n_dups"] == 2 * a["n_dups"]
    assert big["n_surv"] == 2 * a["n_surv"]
