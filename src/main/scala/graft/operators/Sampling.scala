package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group quota sampling — training-mix curation: take
  * exactly `quota(g)` documents from each group (language, source, …),
  * picked by a seedless multiplicative-hash pseudo-shuffle so every
  * engine (and the SQL oracle) reproduces the same sample. Groups absent
  * from the quota map are dropped.
  *
  * Scale shape: a hash-threshold pre-filter (auto-applied, see
  * [[quotaSample]]) cuts each group to ~`slack×quota` survivors BEFORE
  * the per-group rank, so a giant group (90%-English corpora) never hits
  * a single-task full sort; the hash ordering makes the two-step pick
  * identical to the one-step one.
  */
object Sampling {

  /** Knuth multiplicative hash of the id, bounded to avoid 64-bit
    * overflow (DuckDB BIGINT multiplication is checked, so the oracle
    * must compute the identical expression without wrapping).
    */
  private[graft] def pseudoShuffle(id: Column): Column =
    pmod(pmod(id, lit(1048576L)) * lit(2654435761L), lit(4294967296L))

  /** [[pseudoShuffle]] folding 40 id bits instead of 20 — two Knuth-style
    * multiplicative rounds over the low and next-20 bit slices, summed
    * mod 2³². Each product stays under 2⁵² and their sum under 2⁵³, so
    * the identical expression evaluates unwrapped in any engine with
    * checked BIGINT arithmetic. Samplers whose STATISTICAL claim depends
    * on per-id-independent noise (the Gumbel top-k in
    * [[ImportanceSampling.importanceResample]]) use this form: with the
    * 20-bit hash, ids sharing a residue mod 2²⁰ would receive identical
    * noise (~1M distinct values corpus-wide); here collisions need ids
    * equal mod 2⁴⁰ (~10¹² ids before any repeat). Assumes non-negative
    * ids (shiftright is arithmetic).
    */
  private[graft] def pseudoShuffleWide(id: Column): Column =
    pmod(
      pmod(id, lit(1048576L)) * lit(2654435761L) +
        pmod(shiftright(id, 20), lit(1048576L)) * lit(2246822519L),
      lit(4294967296L))

  /** Keep the top `keepTopFrac` of each group by score — the rank-based
    * quality cut every curated corpus applies somewhere ("drop the worst
    * 20% by LM score per language"): exact and deterministic (row_number
    * over (score desc, id asc), keep rank ≤ ⌈frac·n⌉ with the group size
    * from a count over the SAME window partitioning — no extra
    * exchange), so any engine reproduces the identical kept set and the
    * SQL oracle is a two-window QUALIFY.
    *
    * Scale caveat: the per-group rank sorts each group in one task — fine
    * for per-language groups at normal cardinality, but a 100 TB corpus
    * with one giant group should use [[scoreThresholdFilter]], which
    * replaces the sort with an approximate per-group score quantile
    * (one map-side-combined aggregate + broadcast join, no window) at
    * the cost of an approximate boundary.
    *
    * @return input rows + `q_rank` (1-based within group, best first).
    */
  def topFractionByScore(
      df: DataFrame,
      keepTopFrac: Double,
      scoreCol: String = "score",
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(keepTopFrac > 0 && keepTopFrac <= 1, s"keepTopFrac must be in (0,1], got $keepTopFrac")
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("q_rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .filter(col("q_rank") <= ceil(col("__n") * lit(keepTopFrac)))
      .drop("__n")
  }

  /** The corpus-scale form of [[topFractionByScore]]: per-group score
    * threshold at the (1 − keepTopFrac) quantile via `percentile_approx`
    * (map-side-combined sketch, broadcast back), then a stateless filter
    * `score >= threshold` — no per-group sort, no window, skew-immune.
    * The kept fraction is approximate at the quantile-sketch's accuracy;
    * ties at the threshold are all kept.
    */
  def scoreThresholdFilter(
      df: DataFrame,
      keepTopFrac: Double,
      scoreCol: String = "score",
      groupCol: String = "lang",
      accuracy: Int = 10000
  ): DataFrame = {
    require(keepTopFrac > 0 && keepTopFrac <= 1, s"keepTopFrac must be in (0,1], got $keepTopFrac")
    val thr = df.groupBy(groupCol).agg(
      percentile_approx(col(scoreCol), lit(1.0 - keepTopFrac), lit(accuracy)).as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Deterministic train/val/test split assignment: each row lands in the
    * split whose cumulative-fraction bucket its id-hash falls into — the
    * standard reproducible alternative to `randomSplit` (whose output
    * depends on partitioning). Purely map-side: no shuffle, no state, and
    * any engine computing the same multiplicative hash (the SQL oracle
    * does) reproduces the assignment row-for-row. Fractions must sum to 1.
    *
    * @return the input plus a `split` column.
    */
  def splitAssign(
      df: DataFrame,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      idCol: String = "doc_id"
  ): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got: $splits")
    val r = pseudoShuffle(col(idCol))
    // Cumulative thresholds in hash space; the last split takes the rest,
    // so rounding never drops a row.
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * 4294967296.0).toLong)
    val assigned = splits.zip(thresholds).dropRight(1).foldRight(
      lit(splits.last._1)) { case (((name, _), thr), acc) => when(r < thr, name).otherwise(acc) }
    df.withColumn("split", assigned)
  }

  /** Hash-space size of [[pseudoShuffle]] — thresholds live in [0, 2³²). */
  private val HashSpace = 4294967296L

  /** Quota sample with each row's 1-based pick rank within its group.
    *
    * Scale shape — the giant-group guard: a naive
    * `row_number().over(partitionBy(group))` sends EVERY row of a group
    * to one task; on a 90%-English 100 TB corpus that is a single-core
    * sort of 90% of the data. Instead the pick runs in two provably
    * equivalent steps:
    *
    *   1. *Pre-filter*: keep only rows whose hash falls below a per-group
    *      threshold `thr(g) = (slack·quota(g) + 64) / |g|` of the hash
    *      space (group sizes come from a map-side-combined count, joined
    *      back by BROADCAST — the count frame is one row per group).
    *      Groups small enough that `thr ≥ 2³²` skip the filter entirely.
    *   2. *Rank*: the exact `row_number` pick, but over only ~`slack×quota`
    *      survivors per group instead of `|g|`.
    *
    * Equivalence: the rank orders by `(__r, id)` and the filter is a
    * strict `__r < thr` cut, so every excluded row orders after every
    * survivor; as long as a group keeps ≥ `min(quota, |g|)` survivors the
    * two-step pick is IDENTICAL to the one-step one. With the default
    * `slack = 8` the expected survivor count is `8·quota + 64`, putting
    * undershoot at Chernoff-bound odds (< e^-3·quota); the multiplicative
    * hash is low-discrepancy on dense ids, so practice beats that bound.
    * `preFilterSlack = Double.MaxValue` forces the single-step exact path
    * (threshold ≥ 2³² keeps everything) if a pathological id distribution
    * ever undershoots.
    *
    * The corpus is scanned twice (once for counts, once for the pick) —
    * both scans read only (id, group) and the second is cut to ~quota
    * rows map-side, a cheap trade against the single-task giant sort.
    * PlanAudit asserts the pre-filter sits below the rank window.
    *
    * @return (idCol, groupCol, rk)
    */
  def quotaSample(
      df: DataFrame,
      quotas: Map[String, Long],
      groupCol: String = "lang",
      idCol: String = "doc_id",
      preFilterSlack: Double = 8.0
  ): DataFrame = {
    val q = element_at(typedLit(quotas), col(groupCol))
    // Groups without a (positive) quota contribute nothing — drop them
    // map-side, before the count shuffle ever sees them.
    val hashed = df
      .select(col(idCol), col(groupCol), pseudoShuffle(col(idCol)).as("__r"))
      .filter(q.isNotNull && q > 0L)
    val counts = hashed.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val thr =
      if (preFilterSlack == Double.MaxValue) lit(HashSpace)
      else least(
        lit(HashSpace),
        ceil(lit(HashSpace.toDouble) * (q.cast("double") * lit(preFilterSlack) + lit(64.0d)) /
          col("__n").cast("double")).cast("long"))
    val w = Window.partitionBy(groupCol).orderBy(col("__r"), col(idCol))
    hashed
      .join(broadcast(counts), Seq(groupCol))
      .withColumn("__thr", thr)
      .filter(col("__r") < col("__thr"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= q)
      .select(col(idCol), col(groupCol), col("rk"))
  }

  /** Fractional-epoch upsampling — the other half of data mixing: where
    * [[quotaSample]]/[[tokenBudgetSample]] DOWN-sample over-represented
    * groups, real mixes also REPEAT under-represented ones ("2.5 epochs
    * of books, 0.3 of crawl"). Each document emits `⌊f⌋` copies plus one
    * more when its deterministic id-hash falls under the fractional part
    * — so group g's expected volume is exactly `f_g · |g|`, the selection
    * is reproducible by any engine (same multiplicative hash as
    * [[splitAssign]]), and repeats are explicit `copy` indices the
    * shuffle-shard step can key on (`(doc_id, copy)`) so copies land in
    * different shards. Groups without a factor are dropped; `f < 1`
    * up/down-samples in one rule (⌊f⌋ = 0 ⇒ hash-thinned to fraction f).
    *
    * Purely map-side: the factor map rides as a literal, the repeat is a
    * generated `sequence` explode — zero exchanges (PlanAudit).
    *
    * @return (idCol, groupCol, n_copies, copy) — one row per copy,
    *         `copy` in 0 until n_copies.
    */
  def upsampleRepeats(
      df: DataFrame,
      factors: Map[String, Double],
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame =
    upsampleWithCopies(df.select(col(idCol), col(groupCol)), factors, groupCol, idCol)

  /** [[upsampleRepeats]] preserving EVERY input column — the curation
    * pipeline's `upsample` step shape: appending `(n_copies, copy)` in
    * place keeps the step map-side (the operator-then-join-back form
    * would re-shuffle the corpus by id twice for no information).
    */
  private[graft] def upsampleWithCopies(
      df: DataFrame,
      factors: Map[String, Double],
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(factors.values.forall(f => f >= 0 && f <= 1000),
      "epoch factors must be in [0, 1000]")
    val f = element_at(typedLit(factors), col(groupCol))
    val extra = (pseudoShuffle(col(idCol)) <
      (f - floor(f)) * lit(HashSpace.toDouble)).cast("long")
    val copies = floor(f).cast("long") + extra
    df
      .filter(f.isNotNull)
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
  }

  /** Token-budget sampling — the training-mix quota expressed in TOKENS,
    * not documents: real data mixes are specified as "N billion tokens of
    * group g" (token-weighted mixture weights), and a doc-count quota
    * over-samples groups with short documents. Traverses each group in
    * the same deterministic [[quotaSample]] pseudo-shuffle order and
    * keeps every document whose RUNNING token total BEFORE it is still
    * under the group's budget — so the budget-crossing document is
    * included (the sample always reaches the budget when the group can),
    * and a group's sample is a hash-prefix, reproducible by any engine.
    *
    * Scale shape mirrors [[quotaSample]]: per-group token totals
    * aggregate map-side and broadcast back; a hash-threshold pre-filter
    * cuts each group to ~`slack × budget/total` of its docs BEFORE the
    * per-group cumulative window, so a giant group never hits a
    * single-task full sort. The cumulative sum is a growing frame —
    * O(n) per group.
    *
    * @param budgets   group → token budget (groups absent are dropped).
    * @param tokensCol a PRE-COMPUTED per-document token-count column.
    * @return (idCol, groupCol, tokensCol, cum_before) for kept docs.
    */
  def tokenBudgetSample(
      df: DataFrame,
      budgets: Map[String, Long],
      groupCol: String = "lang",
      tokensCol: String = "n_tokens",
      idCol: String = "doc_id",
      preFilterSlack: Double = 8.0
  ): DataFrame = {
    val b = element_at(typedLit(budgets), col(groupCol))
    val hashed = df
      .select(col(idCol), col(groupCol), col(tokensCol),
        pseudoShuffle(col(idCol)).as("__r"))
      .filter(b.isNotNull && b > 0L)
    val totals = hashed.groupBy(groupCol)
      .agg(sum(col(tokensCol)).as("__t"), count(lit(1)).as("__n"))
    // Pre-filter: expected docs in the budget prefix = n·B/T; keep
    // slack× that fraction of the hash space (+64-doc cushion), so the
    // window sorts ~slack·B/T of the group, not all of it.
    val thr =
      if (preFilterSlack == Double.MaxValue) lit(HashSpace)
      else least(
        lit(HashSpace),
        ceil(lit(HashSpace.toDouble) *
          (b.cast("double") * lit(preFilterSlack) / greatest(col("__t").cast("double"), lit(1.0d)) +
            lit(64.0d) / col("__n").cast("double"))).cast("long"))
    val w = Window.partitionBy(groupCol).orderBy(col("__r"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    hashed
      .join(broadcast(totals), Seq(groupCol))
      .withColumn("__thr", thr)
      .filter(col("__r") < col("__thr"))
      .withColumn("cum_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("cum_before") < b)
      .select(col(idCol), col(groupCol), col(tokensCol), col("cum_before"))
  }

  /** Temperature (exponent-smoothed) mixing sample — the standard
    * multilingual/domain data-mixing rule (smoothed sampling with
    * `p_g ∝ n_g^alpha`, as popularized by massively-multilingual
    * pretraining): group g's quota is `max(1, floor(totalN · n_g^alpha /
    * Σ_h n_h^alpha))` — `alpha = 1` reproduces natural proportions,
    * `alpha → 0` flattens toward uniform, upweighting low-resource
    * groups. The pick within each group is the same deterministic
    * multiplicative-hash pseudo-shuffle as [[quotaSample]], and the
    * quota arithmetic stays IN-PLAN (counts → one-row Σ n^alpha, both
    * broadcast) — no driver-side collect of group statistics.
    *
    * The per-group rank is a window over the full group (no hash
    * pre-filter: quotas here are data-dependent, so the threshold cut
    * cannot be proven lossless up front); totalN ≪ corpus mixes should
    * go through [[quotaSample]] with materialized quotas when single
    * groups dominate a 100 TB corpus. `alpha = 0.5` (√-smoothing) is
    * exactly rounded IEEE sqrt on every engine — the cross-engine-
    * reproducible choice the SQL oracle mirrors.
    *
    * @return (idCol, groupCol, rk) — rk = 1-based pick rank in-group.
    */
  def temperatureSample(
      df: DataFrame,
      totalN: Long,
      alpha: Double = 0.5,
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val hashed = df.select(col(idCol), col(groupCol), pseudoShuffle(col(idCol)).as("__r"))
    val counts = hashed.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val z = counts.agg(sum(pow(col("__n").cast("double"), alpha)).as("__z"))
    val quotas = counts.crossJoin(broadcast(z))
      .select(col(groupCol),
        greatest(lit(1L),
          floor(lit(totalN.toDouble) * pow(col("__n").cast("double"), alpha) / col("__z"))
            .cast("long")).as("__q"))
    val w = Window.partitionBy(groupCol).orderBy(col("__r"), col(idCol))
    hashed
      .join(broadcast(quotas), Seq(groupCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= col("__q"))
      .select(col(idCol), col(groupCol), col("rk"))
  }

  /** Deterministic per-group head: keep up to `n` rows of every group,
    * picked by the hash order ([[splitAssign]]'s multiplicative id hash —
    * engine-reproducible, corpus-order-free). The DIVERSITY sampler when
    * `groupCol` is a cluster assignment ([[Similarity.clusterAssign]]):
    * uniform per-cluster representation instead of frequency-weighted —
    * head-heavy topics stop drowning the tail. One window over the
    * group-keyed exchange; no global sort.
    *
    * @return input rows of the kept sample plus their in-group `rk`.
    */
  /** Deterministic weighted k-sample WITHOUT replacement, probability
    * ∝ `weightCol` — the Gumbel-max pick
    * ([[graft.operators.ImportanceSampling.importanceResample]]'s
    * engine) over user-supplied weights instead of LM log-ratios:
    * `key = ln w − ln(−ln u(id))` with the deterministic wide-hash
    * uniform `u(id) = (pseudoShuffleWide(id) + 0.5) / 2³²`, keys
    * rounded to 6 dp (ties → id) so any engine reproduces the pick.
    * Composes with [[Dedup.softDedupWeights]]: soft dedup then a
    * weighted budget draw samples distinct texts uniformly however many
    * copies the crawl carried. Zero-weight rows can never win (ln 0 →
    * −∞) and are dropped up front; a NEGATIVE weight raises in-plan —
    * silent |w| or NaN keys would corrupt the draw.
    *
    * Scale shape: map-side key computation + `TakeOrdered` top-k (a
    * distributed heap, never a global sort); the same residue-collision
    * caveat as the DSIR sampler (independent noise up to ~2⁴⁰ ids).
    *
    * @return (idCol, sample_key) for the k winners, ordered by id.
    */
  def weightedSample(
      docs: DataFrame,
      k: Int,
      weightCol: String = "weight",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val w = when(col(weightCol) < 0,
      raise_error(concat(lit(s"weightedSample: negative $weightCol for id "),
        col(idCol).cast("string"))))
      .otherwise(col(weightCol).cast("double"))
    val u = (pseudoShuffleWide(col(idCol).cast("long")).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    docs
      .select(col(idCol).cast("long").as(idCol), w.as("__w"),
        round(log(w) - log(-log(u)), 6).as("sample_key"))
      .filter(col("__w") > 0)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sample_key"))
      .orderBy(idCol)
  }

  def perGroupHead(
      df: DataFrame,
      n: Long,
      groupCol: String,
      idCol: String = "doc_id",
      preFilterSlack: Double = 8.0
  ): DataFrame = {
    require(n > 0, s"per-group head size must be positive, got $n")
    val hashed = df.withColumn("__r", pseudoShuffle(col(idCol)))
    val w = Window.partitionBy(groupCol).orderBy(col("__r"), col(idCol))
    if (preFilterSlack == Double.MaxValue) {
      hashed
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= n)
        .drop("__r")
    } else {
      // Giant-group guard — the [[quotaSample]] pre-filter with a
      // constant quota: without it one head-heavy group (exactly the
      // distribution the diversity sampler exists for) sorts its WHOLE
      // population on a single window task. The hash threshold keeps
      // ~n·slack+64 expected rows per group before the window — but the
      // hash keys on id mod 2²⁰, so a pathological group whose ids share
      // a residue collapses to few hash values and can undershoot. The
      // filter is therefore AUDITED before use: a per-group survivor
      // count (one more map-side-combined pass over the thin (id, group)
      // projection) disables the threshold for any group it would starve
      // (survivors < min(n, |g|)), so the guard can only cost time,
      // never rows — the pick is always the exact (__r, id)-order head.
      val counts = hashed.groupBy(groupCol).agg(count(lit(1)).as("__n"))
        .withColumn("__thr", least(
          lit(HashSpace),
          ceil(lit(HashSpace.toDouble) * (lit(n.toDouble) * lit(preFilterSlack) + lit(64.0d)) /
            col("__n").cast("double")).cast("long")))
      val kept = hashed
        .join(broadcast(counts), Seq(groupCol))
        .filter(col("__r") < col("__thr"))
        .groupBy(groupCol).agg(count(lit(1)).as("__kept"))
      val safeThr = counts.join(kept, Seq(groupCol), "left")
        .select(col(groupCol),
          when(coalesce(col("__kept"), lit(0L)) >= least(lit(n), col("__n")),
            col("__thr")).otherwise(lit(HashSpace)).as("__thr"))
      hashed
        .join(broadcast(safeThr), Seq(groupCol))
        .filter(col("__r") < col("__thr"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= n)
        .drop("__r", "__thr")
    }
  }

  /** Data-mix planning: turn a target mixture specification ("50% en,
    * 12.5% each of the rest", the LLaMA/Pile-style recipe) into the
    * per-group EPOCH factors [[upsampleRepeats]] consumes —
    * `epochs_g = (w_g / Σw) · totalTokens / tokens_g`. This is the
    * bridge between how mixes are SPECIFIED (token shares of a training
    * budget) and how they are EXECUTED (per-group repeat factors): plan
    * once here, then `upsample` with the resulting factors.
    *
    * One map-side-combined aggregate over the thin `(group, tokens)`
    * projection — group-cardinality output, free at any corpus scale.
    * Groups without a weight are dropped from the mix (no row — compare
    * the output row count to the weight map's to spot absent groups);
    * weights are normalized over the FULL map, so an absent weighted
    * group leaves the budget deliberately unfilled rather than silently
    * inflating everyone else.
    *
    * @return one row per present weighted group, ordered:
    *         `(groupCol, n_docs, tokens, weight, target_tokens, epochs)`
    *         — weight normalized (6 dp), target_tokens = its share of
    *         the budget (3 dp), epochs = target/actual tokens (6 dp;
    *         &gt;1 ⇒ upsample, &lt;1 ⇒ downsample; null when the group
    *         has no positive token mass — no repeat factor exists).
    */
  def mixPlan(
      docs: DataFrame,
      weights: Map[String, Double],
      totalTokens: Long,
      groupCol: String = "lang",
      tokenCol: String = "n_tokens"
  ): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mix weights must be a non-empty map of positive shares")
    val wSum = weights.values.sum
    val norm = weights.map { case (k, v) => k -> v / wSum }
    val w = element_at(typedLit(norm), col(groupCol))
    docs
      .select(col(groupCol), col(tokenCol).cast("long").as("__t"))
      .filter(w.isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("tokens"))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        round(w, 6).as("weight"),
        round(w * totalTokens, 3).as("target_tokens"),
        // Guarded division: a weighted group whose docs are all empty
        // (token sum 0) or all-null has NO meaningful repeat factor —
        // emit null epochs (callers must resolve before upsampling)
        // rather than Infinity/null-by-arithmetic-accident.
        when(col("tokens") > 0, round(w * totalTokens / col("tokens"), 6))
          .otherwise(lit(null).cast("double")).as("epochs"))
      .orderBy(groupCol)
  }

  /** UniMax mixture allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023, Algorithm 1): instead of hand-picked
    * weights ([[mixPlan]]) or temperature smoothing, spread the token
    * budget UNIFORMLY over groups subject to a per-group epoch cap —
    * low-resource groups contribute everything they have up to
    * `maxEpochs` repetitions, and the budget they can't absorb flows to
    * the groups that can. The paper's sequential greedy (ascending
    * token mass, give each group `min(cap, remaining/left)`) is exactly
    * prefix-capped waterfilling: once one group is uncapped the uniform
    * share stays constant — `(B_i − B_i/(n−i+1))/(n−i) = B_i/(n−i+1)` —
    * and caps ascend, so every later group is uncapped at the SAME
    * share. The capped set is therefore the prefix where
    * `cap_i·(n−i+1) + Σ_{j&lt;i} cap_j &lt; B` (that expression is
    * nondecreasing in i), and the whole algorithm collapses to window
    * cumsums — no iteration, and an exact SQL oracle replays it.
    *
    * Scale shape: one map-side-combined aggregate over the thin
    * `(group, tokens)` projection, then windows over the GROUP-
    * cardinality frame (languages/sources — thousands at most at
    * 100 TB), the same post-aggregate single-partition shape as
    * [[mixPlan]]'s output. Zero-token groups are dropped (no cap, no
    * epochs — nothing to allocate against).
    *
    * @param totalTokens the training budget B
    * @param maxEpochs   cap on repetitions of any group's token mass
    * @return one row per group with positive token mass, ordered:
    *         `(groupCol, n_docs, tokens, cap_tokens, alloc_tokens,
    *         epochs)` — cap = tokens·maxEpochs (3 dp), alloc the
    *         waterfilled budget share (3 dp; Σ = min(B, Σcap)), epochs
    *         = alloc/tokens (6 dp, ≤ maxEpochs by construction).
    */
  def unimaxPlan(
      docs: DataFrame,
      totalTokens: Long,
      maxEpochs: Double,
      groupCol: String = "lang",
      tokenCol: String = "n_tokens"
  ): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val b = lit(totalTokens.toDouble)
    val byCap = Window.orderBy(col("__cap"), col(groupCol))
    val all = Window.partitionBy()
    docs
      .select(col(groupCol), col(tokenCol).cast("long").as("__t"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("tokens"))
      .filter(col("tokens") > 0)
      .withColumn("__cap", col("tokens") * lit(maxEpochs))
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__cprev", coalesce(
        sum("__cap").over(byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__capped",
        col("__cap") * (col("__n") - col("__i") + 1) + col("__cprev") < b)
      // t = |capped prefix|, Ct = its cap mass; share = (B − Ct)/(n − t)
      // for the uncapped suffix (guarded: all-capped ⇒ suffix empty).
      .withColumn("__t_idx", coalesce(
        max(when(col("__capped"), col("__i"))).over(all), lit(0)))
      .withColumn("__ct", coalesce(
        max(when(col("__capped"), col("__cprev") + col("__cap"))).over(all), lit(0.0)))
      .withColumn("__alloc", when(col("__capped"), col("__cap"))
        .otherwise((b - col("__ct")) / (col("__n") - col("__t_idx"))))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        round(col("__cap"), 3).as("cap_tokens"),
        round(col("__alloc"), 3).as("alloc_tokens"),
        round(col("__alloc") / col("tokens"), 6).as("epochs"))
      .orderBy(groupCol)
  }

  /** Execute a [[unimaxPlan]]: materialize each group's allocated
    * epochs as explicit `(id, copy)` repeats — full epochs copy every
    * document, and the fractional remainder is [[upsampleRepeats]]'s
    * per-document hash pick at probability `e − ⌊e⌋` (token mass
    * matches the allocation in EXPECTATION; the token-exact
    * hash-prefix alternative needs a per-group sorted cumsum whose
    * dominant group becomes one giant sort task at corpus scale —
    * epoch factors here can approach 1 full epoch, so no
    * [[tokenBudgetSample]]-style lossless pre-filter exists). The plan
    * is group-cardinality and arrives by broadcast, so beyond
    * [[unimaxPlan]]'s one aggregate the step is map-side: no exchange
    * of corpus-sized data, same shape as the `upsample` pipeline step.
    *
    * Uses the plan's 6-dp-rounded `epochs` (not the raw quotient), so
    * any engine replaying the rounded plan reproduces the pick
    * bit-exactly. Output rows are keyed `(id, copy)` — shuffle-shard
    * (with `copyCol`) before training ingestion.
    *
    * @return every input column plus `copy` (0-based repeat index);
    *         groups with zero token mass drop with the plan.
    */
  def unimaxSample(
      df: DataFrame,
      totalTokens: Long,
      maxEpochs: Double,
      groupCol: String = "lang",
      tokensCol: String = "n_tokens",
      idCol: String = "doc_id"
  ): DataFrame = {
    val plan = unimaxPlan(df, totalTokens, maxEpochs, groupCol, tokensCol)
      .select(col(groupCol), col("epochs").as("__e"))
    val extra = (pseudoShuffle(col(idCol)) <
      (col("__e") - floor(col("__e"))) * lit(HashSpace.toDouble)).cast("long")
    df
      .join(broadcast(plan), Seq(groupCol))
      .withColumn("__copies", floor(col("__e")).cast("long") + extra)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__e", "__copies")
  }

  /** Deterministic global shuffle-shard: every row lands in shard
    * `hash(id) mod numShards` at position `rank of hash(id) within the
    * shard` — the training-order randomization step that closes the
    * curation pipeline (models must not see the corpus in crawl/source
    * order; `df.orderBy(rand())` is irreproducible and a single global
    * sort besides). One hash-partitioned exchange on the shard key +
    * per-shard rank — no global total order is ever materialized, which
    * is what makes it the 100 TB plan (a global sort's range partitioning
    * needs sampling and balancing; shard-local order is enough for
    * training ingestion and each shard writes independently). Same
    * multiplicative id-hash as [[splitAssign]], so the SQL oracle
    * reproduces the permutation row-for-row.
    *
    * After an [[upsampleRepeats]] step rows are keyed by `(id, copy)`,
    * not id alone — pass `copyCol` and the hash mixes the copy index in
    * (`id·131 + copy`, still closed-form for the oracle), so a doc's
    * copies land in DIFFERENT shards/positions instead of stacking
    * back-to-back (repeats adjacent in training order defeat the point
    * of repeating them).
    *
    * @return (idCol [, copyCol], shard, pos) — pos is the 1-based
    *         position within the shard; reading shards in order of
    *         (shard, pos) yields the full deterministic permutation.
    */
  /** @param epochSeed varies the permutation per training EPOCH while
    *                   staying closed-form (`hash(key + seed·7919)`):
    *                   multi-epoch runs should not replay the identical
    *                   global order (batch composition repeats defeat
    *                   shuffling's decorrelation), and `rand()` is
    *                   irreproducible. Seed 0 is the legacy permutation
    *                   — existing oracles and goldens are unchanged.
    */
  def shuffleShards(
      df: DataFrame,
      numShards: Int,
      idCol: String = "doc_id",
      copyCol: Option[String] = None,
      epochSeed: Long = 0L
  ): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val baseKey = copyCol match {
      case Some(c) => col(idCol) * lit(131L) + col(c)
      case None    => col(idCol)
    }
    val key = if (epochSeed == 0L) baseKey else baseKey + lit(epochSeed * 7919L)
    val keyCols = col(idCol) +: copyCol.map(col).toSeq
    val hashed = df.select(keyCols :+ pseudoShuffle(key).as("__r"): _*)
      .withColumn("shard", pmod(col("__r"), lit(numShards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("__r") +: keyCols: _*)
    hashed
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(keyCols ++ Seq(col("shard"), col("pos")): _*)
  }
}
