"""Registry iteration-order contract: external correctness harnesses
that sample a prefix of ``queries()`` must see the LLM-pipeline surface
(dedup / similarity / curation / graph / text / events / inference)
before the relational tail."""

from etl_tpch_spark.registry import DRIVER_WINDOW, load_all


def test_window_names_exist_and_lead():
    qs = list(load_all().keys())
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert qs[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_window_covers_differentiating_operators():
    # round 7 policy (VERDICT r6 #6): oldest-certification-first.  The
    # window must still lead with the round's NEW surface and the
    # changed code paths, and keep at least one live row per
    # differentiating family (dedup / similarity / graph / text /
    # events / multimodal) ahead of the relational backlog tail.
    must_have = {
        # new this round
        "multimodal_near_dup_pairs",
        "text_bigram_lm_indexed",
        # round-7-changed code paths
        "dedup_simhash",
        "graph_pagerank",
        "sim_ann_topk_ivf",
        "sim_cosine_pairs_cells",
        "text_bigram_lm",
        # round-7 second-session changed paths (set-level band join,
        # distinct-vector cell kernels)
        "dedup_minhash_lsh",
        "sim_quantized_cosine_pairs_cells",
        "dedup_embedding_clusters",
        # family sentinels from the backlog slice
        "dedup_exact",
        "sim_kmeans_clusters",
        "events_funnel",
    }
    assert must_have <= set(DRIVER_WINDOW)


def test_window_entries_all_have_oracles():
    # every driver-certified query should get the strong (hash) check;
    # rows-only entries belong outside the window
    reg = load_all()
    missing = [n for n in DRIVER_WINDOW if not reg[n].oracle]
    assert missing == [], missing
