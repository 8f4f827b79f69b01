"""soda_core_spark — a from-scratch PySpark-native analytics / data-quality
engine with the check semantics of sodadata/soda-core, recast as:

* a declarative contract-check engine compiled to fused DataFrame
  aggregations (one ``df.agg`` per scan instead of generated SQL strings),
* a partition-parallel keep/drop **quality-filter pipeline** for
  Common-Crawl-style web pages (language-ID, perplexity, heuristic rules,
  PII/toxicity scrub), and
* large-scale training-data operators (dedup, similarity search, text
  analysis) built on the same primitives.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's *behaviour* (cited by file:line in
docstrings). No code is copied from the reference — the reference is a
SQL-string compiler over external engines; this is a native DataFrame
planner.
"""

__version__ = "0.1.0"

from soda_core_spark.plans.model import (  # noqa: F401
    CheckSpec,
    ColumnSpec,
    Contract,
    MissingConfig,
    Threshold,
    ValidityConfig,
)
from soda_core_spark.plans.results import (  # noqa: F401
    CheckOutcome,
    CheckResult,
    ContractVerificationResult,
    Measurement,
)
from soda_core_spark.operators.engine import (  # noqa: F401
    verify_contract,
    verify_contracts,
)
from soda_core_spark.operators.checks import (  # noqa: F401
    AggMetric,
    CheckContext,
    CheckPlan,
    SideQuery,
    register_check_type,
    unregister_check_type,
)
from soda_core_spark.plans.results import SessionResult  # noqa: F401
from soda_core_spark.sources.snapshots import (  # noqa: F401
    CommitConflict,
    NoSuchSnapshot,
    Snapshot,
    SnapshotTable,
)
from soda_core_spark.functions.bpe import (  # noqa: F401
    bpe_token_counts,
    bpe_tokenize,
    train_bpe,
)
from soda_core_spark.functions.embeddings_qc import (  # noqa: F401
    with_embedding_diagnostics,
)
from soda_core_spark.functions.mojibake import (  # noqa: F401
    mojibake_signals,
    repair_mojibake,
)
from soda_core_spark.operators.justext import (  # noqa: F401
    justext_blocks,
    justext_extract,
)
from soda_core_spark.operators.nbgram import (  # noqa: F401
    nb_quality_classifier,
)
from soda_core_spark.operators.history import (  # noqa: F401
    metric_history,
    register_metric_anomaly_check,
    register_metric_change_check,
)
from soda_core_spark.sources.metadata_checks import (  # noqa: F401
    verify_contract_metadata_only,
)
from soda_core_spark.operators.attribution import (  # noqa: F401
    rule_attribution,
    rule_pack_diff,
)
from soda_core_spark.operators.blocklist import (  # noqa: F401
    host_reputation_gate,
)
from soda_core_spark.operators.dedup import (  # noqa: F401
    cluster_size_histogram,
    corpus_paragraph_dedup,
    mirror_hosts,
)
from soda_core_spark.functions.html import (  # noqa: F401
    robots_meta_gate,
    with_lang_mismatch,
    with_robots_directives,
)
from soda_core_spark.operators.profiling import group_diversity  # noqa: F401
from soda_core_spark.packaging import build_pyfiles_zip  # noqa: F401
from soda_core_spark.sources.tables import corrupt_file_audit  # noqa: F401
from soda_core_spark.sources.warc import parse_warc_records  # noqa: F401
from soda_core_spark.functions.readability import (  # noqa: F401
    with_readability,
)
from soda_core_spark.functions.langid import (  # noqa: F401
    paragraph_lang_profile,
)
from soda_core_spark.operators.linkgraph import host_hits  # noqa: F401
from soda_core_spark.operators.urls import (  # noqa: F401
    registered_domain_col,
)
from soda_core_spark.operators.urls import (  # noqa: F401
    crawl_trap_hosts,
    path_template_col,
)
from soda_core_spark.operators.profiling import zipf_fit  # noqa: F401
from soda_core_spark.operators.attribution import (  # noqa: F401
    decision_kappa,
)
from soda_core_spark.functions.embeddings_qc import (  # noqa: F401
    group_coherence,
)
from soda_core_spark.operators.blocklist import lexicon_score  # noqa: F401
from soda_core_spark.operators.dedup import lsh_recall_audit  # noqa: F401
from soda_core_spark.sources.layout import (  # noqa: F401
    write_partitioned_idempotent,
)
from soda_core_spark.operators.filter_rules import (  # noqa: F401
    EXTENDED_SIGNAL_RULES,
    with_extended_signals,
)
from soda_core_spark.operators.urls import url_dedup_latest  # noqa: F401
from soda_core_spark.operators.dedup import (  # noqa: F401
    minhash_calibration,
)
from soda_core_spark.operators.urls import (  # noqa: F401
    URL_CLASS_RULES,
    url_class_col,
)
from soda_core_spark.operators.calibration import (  # noqa: F401
    calibrate_drop_thresholds,
)
from soda_core_spark.sources.tables import read_documents_jsonl  # noqa: F401
from soda_core_spark.functions.multimodal import decode_bmp  # noqa: F401
from soda_core_spark.operators.semdedup import (  # noqa: F401
    derive_k,
    kmeans_fit_assign,
    semdedup,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    corpus_concentration,
    robust_anomaly_days,
    spearman_correlation,
    vocab_divergence,
    vocabulary_novelty,
)
from soda_core_spark.operators.similarity import (  # noqa: F401
    decontaminate_embeddings,
)
from soda_core_spark.operators.dedup import (  # noqa: F401
    boilerplate_ngrams,
    winnow_fingerprints,
)
from soda_core_spark.operators.attribution import fleiss_kappa  # noqa: F401
from soda_core_spark.operators.calibration import (  # noqa: F401
    classifier_auc,
    classifier_reliability,
)
from soda_core_spark.operators.sampling import mixture_plan  # noqa: F401
from soda_core_spark.operators.dedup import soft_dedup_weights  # noqa: F401
from soda_core_spark.operators.retrieval import rank_fusion  # noqa: F401
from soda_core_spark.operators.profiling import heaps_law_fit  # noqa: F401
from soda_core_spark.operators.attribution import (  # noqa: F401
    poisson_bootstrap_rates,
)
from soda_core_spark.functions.embeddings_qc import (  # noqa: F401
    embedding_anisotropy,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    vocabulary_coverage,
)
from soda_core_spark.operators.profiling import winsorized_stats  # noqa: F401
from soda_core_spark.operators.profiling import (  # noqa: F401
    INVISIBLE_CHAR_CLASSES,
    LLM_CONTAMINATION_PATTERNS,
    MARKUP_RESIDUE_PATTERNS,
    distinct_ngram_diversity,
    invisible_chars,
    llm_contamination,
    markup_residue,
    pii_cooccurrence,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    mann_whitney_groups,
)
from soda_core_spark.operators.dedup import clustering_agreement  # noqa: F401
from soda_core_spark.operators.dedup import dedup_design_effect  # noqa: F401
from soda_core_spark.operators.semistructured import (  # noqa: F401
    json_field_profile,
)
from soda_core_spark.operators.semistructured import (  # noqa: F401
    json_key_census,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    benford_audit,
    functional_dependency_audit,
)
from soda_core_spark.operators.checks import (  # noqa: F401
    referential_integrity_profile,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    event_transition_matrix,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    interarrival_burstiness,
)
from soda_core_spark.operators.checks import (  # noqa: F401
    reconciliation_audit,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    retention_cohorts,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    correlation_matrix,
    mann_kendall_trend,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    cusum_changepoint,
    dow_seasonality,
    runs_test,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    soft_error_pages,
    truncation_artifacts,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    distinctive_tokens,
)
from soda_core_spark.operators.sampling import exemplar_sample  # noqa: F401
from soda_core_spark.operators.filter_rules import (  # noqa: F401
    WEBSHELL_SIGNAL_RULES,
    with_webshell_signals,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    SEMANTIC_TYPE_PATTERNS,
    primary_key_candidates,
    semantic_type_inference,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    hapax_share_per_doc,
    missingness_structure,
)
from soda_core_spark.operators.profiling import (  # noqa: F401
    signal_drift_panel,
)
from soda_core_spark.operators.profiling import language_mix  # noqa: F401
from soda_core_spark.operators.profiling import k_anonymity_audit  # noqa: F401
from soda_core_spark.operators.profiling import (  # noqa: F401
    anova_oneway,
    bracket_balance_audit,
    brown_forsythe,
    capitalization_profile,
    cramers_v,
    mad_outlier_audit,
    punctuation_run_profile,
    quoted_text_share,
    sentence_length_profile,
    source_token_cosine,
    spearman_matrix,
    temporal_mentions,
    vocabulary_richness,
)
from soda_core_spark.operators.similarity import knn_hubness  # noqa: F401
from soda_core_spark.operators.temporal_join import (  # noqa: F401
    asof_join,
    range_count_join,
)
