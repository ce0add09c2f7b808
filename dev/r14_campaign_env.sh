# r14 100x verification campaign key sets (sourced by the dev loop).
# KEYS32 = r13's 30 top keys + the two r14 additions
# (graph_jaccard_bucketed, dedup_hamming64).
KEYS32="set_except_all,set_intersect_all,sink_parquet_part,sketch_bloom,sketch_kmv,text_langid,ts_downsample,ts_outlier_mad,win_topk_pergroup,text_bpe_merges,text_dupspans,text_tfidf,text_vocab_growth,vec_centroid,vec_ivfpq,vec_rerank_mmr,join_shuffle,join_skew_salted,pipeline_sensor,sql_recursive,graph_assortativity,agg_percentile,curate_dsir,dedup_containment,dedup_ngram,fn_date,dedup_hamming,graph_distance,graph_kcore,graph_jaccard,graph_jaccard_bucketed,dedup_hamming64"
# Digest keys: outputs too large to dump/compare row-wise at 100x
# (dedup_hamming ~N^2/512 pairs at the saturated 16-bit space; the
# jaccard pair lists; the trigram pair lists).
DIGEST5="dedup_hamming,dedup_ngram,graph_jaccard,graph_jaccard_bucketed,dedup_hamming64"
# Stage keys: WITH-prefixed oracles whose CTEs get materialized as
# tables in the disk-backed DuckDB so the 100x intermediates spill to
# disk instead of exhausting RAM (sql_recursive auto-falls-back).
STAGE_KEYS="sketch_bloom,sketch_kmv,text_langid,ts_downsample,ts_outlier_mad,win_topk_pergroup,text_bpe_merges,text_dupspans,text_tfidf,text_vocab_growth,vec_centroid,vec_ivfpq,vec_rerank_mmr,pipeline_sensor,graph_assortativity,curate_dsir,dedup_containment,dedup_ngram,fn_date,dedup_hamming,graph_distance,graph_kcore,graph_jaccard,graph_jaccard_bucketed,dedup_hamming64"
# r14 addition measured/verified separately (code lands mid-campaign):
KEY_LPA="graph_lpa"
# Full r14 campaign set (r15+: use this; 34 keys incl. the r14 adds).
KEYS34="$KEYS32,graph_lpa,graph_modularity"
# NOTE r14: do NOT put vec_ivfpq in STAGE_KEYS — materializing its ADC
# CTEs as disk tables is what killed the oracle (spill disk-full, then
# OOM); unstaged it passes row-wise in minutes at CHECK_MEM=60GB.
