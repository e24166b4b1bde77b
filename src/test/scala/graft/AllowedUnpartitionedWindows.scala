package graft

/** The frozen enumeration of queries certified to plan an
  * unpartitioned window over an aggregate-grain (bounded) input — see
  * [[WindowAuditSpec]]. One name per line so review diffs are exact.
  *
  * Every entry is a lattice/census-grain sort: a KS/rank test over a
  * bounded grid, a Pareto/gains curve over a groupBy key space, a
  * Lattice.checkpointBounded frame, or a top-k-limited input. (The
  * Ranks census window left this list entirely in r11 — the
  * prefix_offsets aggregate replaced it, so 22 entries whose only
  * unpartitioned window was that census are gone.) These
  * are also the certified sources of the cosmetic `WindowExec: No
  * Partition Defined` WARNs in bench logs. */
object AllowedUnpartitionedWindows {
  val names: Set[String] = Set(
    "q105_bpe_pair_stats",
    "q124_rrf_fusion",
    "q125_pareto_skyline",
    "q150_km_survival",
    "q152_ks_test",
    "q155_cusum_changepoint",
    "q158_autocorrelation",
    "q162_lttb_downsample",
    "q179_pareto_curve",
    "q187_heaps_curve",
    "q212_seasonal_anomaly",
    "q213_open_interval_peak",
    "q229_weighted_sample",
    "q240_ewma_chart",
    "q255_adoption_curve",
    "q266_decision_stump",
    "q276_sax_encoding",
    "q277_rolling_ols",
    "q283_bh_fdr",
    "q284_seasonal_decompose",
    "q299_isotonic_regression",
    "q302_rank_turnover",
    "q307_gains_table",
    "q319_theil_u",
    "q322_littles_law",
    "q326_max_drawdown",
    "q327_durbin_watson",
    "q332_runs_test",
    "q335_xmr_chart",
    "q339_granger",
    "q348_token_budget",
    "q351_neyman_allocation",
    "q355_rmst",
    "q356_wilcoxon_signed_rank",
    "q357_mutual_information",
    "q359_wasserstein_distance",
    "q360_cliffs_delta",
    "q362_jonckheere_terpstra",
    "q364_energy_distance",
    "q365_moods_median",
    "q366_mase",
    "q368_tracking_signal",
    "q369_crps",
    "q370_diebold_mariano",
    "q371_ordinal_association",
    "q372_nelson_aalen",
    "q374_quade_test",
    "q385_interarrival_expcheck",
    "q386_cramer_von_mises",
    "q387_anderson_darling",
    "q388_brunner_munzel",
    "q389_ansari_bradley_lepage",
    "q390_kuiper",
    "q396_spectral_entropy",
    "q397_turning_points",
    "q398_record_counts",
    "q399_sample_entropy",
    "q400_permutation_entropy",
    "q409_passing_bablok",
    "q411_mantel_haenszel",
    "q416_weibull_latency",
    "q421_cusum",
    "q422_longest_run",
    "q423_variance_ratio",
    "q425_spectral_flatness",
    "q427_shingle_saturation",
    "q461_erlang_b",
    "q462_newsvendor",
    "q464_safety_stock",
  )
}
