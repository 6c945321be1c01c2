package graft

import graft.operators.{Dedup, Relational, Text}
import org.apache.spark.sql.functions._

/** End-to-end composition of the LLM-data-pipeline library surface:
  * quality-filter -> exact dedup -> near-dup cluster resolution ->
  * train/val/test split -> sequence packing, all over the standard
  * corpus. Each stage consumes the previous stage's DataFrame through
  * the public library API — this pins that the operators actually
  * compose (column contracts line up) and that the end state satisfies
  * the invariants a training-data build needs.
  */
class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("quality -> dedup -> cluster -> split -> pack composes end to end") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. quality gate: keep docs above a (permissive) composite score
    val quality = Text.qualityScore(docs)
    val kept = docs.join(quality.filter(col("quality") > 0.3).select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. exact dedup: keep each content hash's representative
    val reps = Dedup.exactDedup(kept)
    val exactDeduped = kept.join(
      reps.select(col("rep_doc_id").as("doc_id")), "doc_id")
    val nExact = exactDeduped.count()
    assert(nExact <= nKept)
    // representatives are unique by content
    assert(exactDeduped.select("text").distinct().count() === nExact)

    // 3. near-dup cluster resolution: drop every clustered doc that is
    // not its cluster's representative (min id)
    val clusters = Dedup.dupClusters(Dedup.ngramJaccardPairs(exactDeduped))
    val nonReps = clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val resolved = exactDeduped.join(nonReps, Seq("doc_id"), "left_anti")
    val nResolved = resolved.count()
    assert(nResolved <= nExact && nResolved > 0)

    // 4. deterministic split
    val split = Relational.deterministicSplit(resolved.select("doc_id", "text"), "doc_id")
    assert(split.count() === nResolved)
    assert(split.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))

    // 5. pack the train split into token-budget bins
    val train = split.filter(col("split") === "train").select("doc_id", "text")
    val packed = Text.packSequences(train, budgetTokens = 256L)
    assert(packed.count() === train.count())
    // budget invariant: a bin either fits the budget or is one oversized doc
    packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .collect()
      .foreach(r => assert(r.getLong(1) <= 256L || r.getLong(2) === 1L, r.toString))
  }

  test("normalize -> redact -> quality-bucket -> budget-sample -> vocab composes (round-7 surface)") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. canonicalize, then scrub PII from the canonical text
    val normed = Text.normalizeText(docs)
    val scrubbed = Text.redactPii(normed, textCol = "norm_text")
      .select(col("doc_id"), col("redacted"))
    assert(scrubbed.count() === total)

    // 2. quality deciles on the scrubbed text; keep the top half
    val buckets = Text.qualityBuckets(scrubbed, textCol = "redacted")
    val top = buckets.filter(col("bucket") >= 5).select("doc_id", "bucket")
    val nTop = top.count()
    assert(nTop > 0 && nTop < total)

    // 3. token-budget mixture sampling per bucket (tight budget on the
    // best bucket, everything else passes through)
    val withTok = top
      .join(Text.tokenCount(scrubbed, textCol = "redacted")
        .select(col("doc_id"), col("ws_tokens")), "doc_id")
      .withColumn("grp", concat(lit("b"), col("bucket")))
    val sampled = Relational.tokenBudgetSample(withTok, "doc_id", "grp", "ws_tokens",
      Map("b9" -> 200L))
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= nTop)
    // the budgeted bucket actually shrank to (about) its budget
    val b9Tokens = sampled.filter(col("grp") === "b9")
      .agg(coalesce(sum("ws_tokens"), lit(0L))).head().getLong(0)
    val b9Before = withTok.filter(col("grp") === "b9")
      .agg(coalesce(sum("ws_tokens"), lit(0L))).head().getLong(0)
    assert(b9Before === 0L || b9Tokens < b9Before)

    // 4. vocabulary of the final training corpus
    val finalDocs = scrubbed.join(sampled.select("doc_id"), "doc_id")
    val vocab = Text.corpusVocab(finalDocs, textCol = "redacted").collect()
    assert(vocab.nonEmpty)
    val totalCount = vocab.head.getLong(4)
    // cumulative coverage is monotone and bounded by the corpus total
    vocab.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(3))
      case _ =>
    }
    assert(vocab.last.getLong(3) <= totalCount)
  }

  test("embedding pairs -> cluster -> keep-one composes without a label column") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    // 3 planted duplicate groups (sizes 4/3/2) + 200 noise vectors: the
    // label-free pipeline must collapse each group to one representative
    val groups = Seq(4, 3, 2).zipWithIndex.flatMap { case (sz, g) =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until sz).map(i =>
        (5000L + 10L * g + i, base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    }
    val noise = Seq.tabulate(200)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val emb = (groups ++ noise).toDF("vec_id", "embedding")

    val pairs = Dedup.embeddingLshPairs(emb, minCosine = 0.9, topK = 10000)
    val clusters = Dedup.dupClusters(pairs, aCol = "v1", bCol = "v2")
    val nonReps = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    val resolved = emb.join(nonReps, Seq("vec_id"), "left_anti")

    // each planted group collapses to exactly its min id; noise survives
    val survivors = resolved.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(Set(5000L, 5001L, 5002L, 5003L)) === Set(5000L))
    assert(survivors.intersect(Set(5010L, 5011L, 5012L)) === Set(5010L))
    assert(survivors.intersect(Set(5020L, 5021L)) === Set(5020L))
    assert((0L until 200L).forall(survivors.contains),
      "noise vectors must survive label-free dedup")
  }

  test("knn graph -> cosine threshold -> dupClusters is an equivalent dedup route") {
    import spark.implicits._
    // same planted-group corpus shape as above, resolved through the
    // r9 knn-graph operator instead of the threshold pair generator:
    // the graph's thresholded edges are a drop-in dupClusters input
    val rnd = new scala.util.Random(19)
    val dim = 24
    val groups = Seq(4, 3, 2).zipWithIndex.flatMap { case (sz, g) =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      Seq.tabulate(sz)(i =>
        (5000L + 10L * g + i, base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    }
    val noise = Seq.tabulate(200)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val emb = (groups ++ noise).toDF("vec_id", "embedding")

    val knn = graft.operators.Similarity.knnJoinLsh(emb, k = 5)
    val clusters = Dedup.dupClusters(knn.filter(col("cosine") >= 0.9),
      aCol = "q_id", bCol = "n_id")
    val nonReps = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    val survivors = emb.join(nonReps, Seq("vec_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(Set(5000L, 5001L, 5002L, 5003L)) === Set(5000L))
    assert(survivors.intersect(Set(5010L, 5011L, 5012L)) === Set(5010L))
    assert(survivors.intersect(Set(5020L, 5021L)) === Set(5020L))
    assert((0L until 200L).forall(survivors.contains),
      "noise vectors must survive knn-graph dedup")
  }

  test("vintage round trip: diff-derived changeset merged onto old reproduces new exactly") {
    // the q22/q24 closure property: snapshotDiff captures EVERYTHING
    // that changed, cdcMerge applies EXACTLY a changeset — so merging
    // the diff (added/changed -> upsert, removed -> delete) onto the
    // old vintage must rebuild the new vintage row for row. Uses the
    // q22 gate's own two order vintages.
    val o = Tables.orders(spark, sf)
    val oldSnap = o.filter(pmod(col("o_orderkey"), lit(7L)) =!= 0L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val newSnap = o.filter(pmod(col("o_orderkey"), lit(11L)) =!= 3L)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(pmod(col("o_orderkey"), lit(5L)) === 0L, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val diff = Relational.snapshotDiff(oldSnap, newSnap,
      Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
    val changeset = diff.select(col("o_orderkey"),
      col("new_o_orderstatus").as("o_orderstatus"),
      col("new_o_totalprice").as("o_totalprice"),
      when(col("change_type") === "removed", lit("D")).otherwise(lit("U")).as("op"))
    val merged = Relational.cdcMerge(oldSnap, changeset, Seq("o_orderkey"))
      .collect().map(_.toSeq).toSet
    val want = newSnap.collect().map(_.toSeq).toSet
    assert(merged === want)
  }

  test("LM fluency gate -> split -> pack composes with the learned-model stage") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val total = docs.count()
    // train on the corpus, localize the bounded model, score in one pass
    val (uniD, bgD) = Text.lmTrain(docs, topV = 2000, topB = 20000)
    val (uni, bg) = Text.lmLocalize(uniD, bgD)
    val ppl = Text.lmPerplexity(docs, uni, bg)
    assert(ppl.count() === total)
    // a permissive fluency ceiling keeps most of the self-scored corpus
    val fluent = docs.join(
      ppl.filter(col("perplexity") < 1e6).select("doc_id"), "doc_id")
    val nFluent = fluent.count()
    assert(nFluent > 0 && nFluent <= total)
    // downstream the usual split + pack contract holds on the survivors
    val splits = Relational.deterministicSplit(fluent, "doc_id")
    val train = splits.filter(col("split") === "train")
    val packed = Text.packSequences(train, budgetTokens = 2048L)
    assert(packed.count() === train.count(), "every fluent train doc packs exactly once")
  }

  test("entropy gate -> line dedup -> skew-safe dim join composes (round-10 surface)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    val total = docs.count()

    // 1. entropy gates: drop mash/template docs (permissive thresholds
    //    keep most of the word-salad synthetic corpus)
    val ent = Text.entropyStats(docs)
    val kept = docs.join(
      ent.filter(col("char_entropy") > 1.0 && col("token_entropy") > 1.0)
        .select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. line-level boilerplate strip: chunk -> global keep-first ->
    //    the stripped text carries forward as the new doc body
    val lines = Text.chunkDocs(kept, chunkSize = 16, stride = 16)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val stripped = Dedup.lineDedup(lines, "doc_id", "chunk_id", "chunk_text")
    assert(stripped.count() === lines.select("doc_id").distinct().count())
    // mass conservation: kept + removed = total lines
    assert(stripped.filter(col("n_kept") + col("n_removed") =!= col("n_lines")).count() === 0L)
    // this corpus repeats 16-token chunks across docs rarely but not
    // never at sf0.001 — at minimum nothing NEGATIVE and text rebuilds
    val rebuilt = stripped.filter(col("n_removed") === 0L)
      .join(kept, "doc_id")
      .filter(col("kept_text") =!= regexp_replace(col("text"), "\\s+", " "))
    // docs with nothing removed rebuild to their (whitespace-collapsed,
    // 16-token-grouped) token stream exactly
    assert(rebuilt.count() === 0L)

    // 3. attach a dimension through the deterministic salted join and
    //    re-derive the plain-join answer
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("src_key"), col("c_name"))
    val fact = stripped.withColumn("src_key", col("doc_id") % 100)
    val viaSalt = Relational.saltedJoin(fact, dim, "src_key", salt = 4)
    val plain = fact.join(dim, Seq("src_key"))
    assert(viaSalt.count() === plain.count())

    // 4. the SQ8 retrieval tier slots in where IVF/PQ would
    val emb = Tables.embeddings(spark, sf)
    val nn = graft.operators.ProductQuantization.annSq8(
      emb, emb.filter(col("vec_id") < 3), k = 5)
    assert(nn.select("q_id").distinct().count() === 3L)
  }

  test("profile -> weighted mix -> binary retrieval -> jsonl egress composes (late-r10 surface)") {
    import graft.operators.Similarity
    import graft.sources.CorpusSource

    // 1. profile the corpus: distribution shape + robust outlier
    //    fences agree on the value column's support
    val hist = Relational.groupHistogram(Tables.events(spark, sf), "event_type", "value")
    val fences = Relational.iqrOutliers(Tables.events(spark, sf), "event_type", "value")
    val hByG = hist.groupBy("group").agg(
      min("bin_lo").as("lo"), max("bin_hi").as("hi"), sum("n").as("mass"))
    val joined = hByG.join(fences, Seq("group")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // histogram mass equals the fence pass's population
      assert(r.getLong(3) === r.getAs[Long]("n_values"), r.toString)
    }

    // 2. weighted source mix: longer docs proportionally likelier,
    //    deterministic across engines and partitionings
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang", "source", "n_chars")
    val mixed = Relational.weightedSample(docs, "source", "doc_id", "n_chars", 25)
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed <= docs.select("source").distinct().count() * 25)

    // 3. the sampled corpus leaves as JSONL and round-trips exactly
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_jsonl").toString + "/mix"
    CorpusSource.writeJsonl(mixed.join(docs.select("doc_id", "text", "lang"), "doc_id"), out)
    val (clean, corrupt) = CorpusSource.quarantine(CorpusSource.readJsonl(
      spark, out, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))))
    assert(corrupt.count() === 0L && clean.count() === nMixed)

    // 4. binary-code retrieval tier over the embeddings: exact hamming
    //    and the pruned path agree on the planted-duplicate answer
    val codes = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.signCode(col("embedding")).as("code"))
    val queries = codes.filter(col("vec_id") < 3)
    val exact = Similarity.hammingKnn(codes, queries, k = 5)
    val pruned = Similarity.hammingKnnPruned(codes, queries, k = 5)
    assert(exact.select("q_id").distinct().count() === 3L)
    assert(pruned.select("q_id").distinct().count() === 3L)

    // 5. behavioral summary per user: funnel stage and activity runs
    //    derive from the same events, so their user sets must nest
    val fun = Relational.q39Funnel(spark, sf).select("user_id").distinct()
    val isl = Relational.q35GapIslands(spark, sf).select("user_id").distinct()
    assert(fun.exceptAll(isl).count() === 0L)
  }

  test("template dedup -> retention/attribution -> densify+rolling -> propagation -> compaction composes (final-r10 surface)") {
    import graft.operators.Similarity

    // 1. canonicalization can only MERGE groups exact hashing keeps apart
    val docs = Tables.documents(spark, sf)
    val exactGroups = Dedup.exactDedup(docs).count()
    val templGroups = Dedup.templateDedup(docs).count()
    assert(templGroups <= exactGroups && templGroups > 0)

    // 2. behavioral stack over ONE events table: the cohort matrix's
    //    activity mass is positive and every attributed conversion's
    //    user exists in the same universe
    val cohorts = Relational.q44CohortRetention(spark, sf)
    assert(cohorts.agg(sum("n_active")).head.getLong(0) > 0L)
    val conv = Relational.q48Attribution(spark, sf).select("user_id").distinct()
    val users = Tables.events(spark, sf).select("user_id").distinct()
    assert(conv.exceptAll(users).count() === 0L)

    // 3. densify -> rolling: on the gap-free LOCF spine every trailing
    //    frame is FULL once past warm-up (roll_n == min(span, age+1)) —
    //    the cross-operator contract that makes rolling features sane
    val daily = Tables.events(spark, sf)
      .withColumn("day", expr("ts div 86400000000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("v"))
    val dense = Relational.densifyLocf(daily, "event_type", "day", "v")
    val rolled = Relational.rollingWindowStats(dense, "event_type", "day", "value", 4)
    rolled.collect().groupBy(_.getString(0)).values.foreach { rows =>
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(4) === math.min(4, i + 1).toLong, r.toString)
      }
    }

    // 4. the propagation tier consumes the knn graph the retrieval tier
    //    builds; smoothed scores stay inside the label hull
    val emb = Tables.embeddings(spark, sf)
    val graph = Similarity.knnJoin(emb, k = 5)
    val prop = Similarity.scorePropagation(
      emb.select(col("vec_id"), col("label").cast("double").as("score")), graph)
    val scores = prop.collect()
    assert(scores.length.toLong === emb.count())
    scores.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 9.0, r.toString))

    // 5. the lake-maintenance plan accounts for every "file" exactly once
    val plan = Relational.q46CompactionBins(spark, sf)
    assert(plan.agg(sum("n_files")).head.getLong(0) === Tables.orders(spark, sf).count())
  }

  test("consensus/kappa -> robust stats -> drift gate -> quality filters -> encode -> shard export composes (r11 surface)") {
    import graft.operators.Text
    import graft.sinks.CorpusShards

    // 1. annotation QA: kappa scores exactly the items consensus
    //    resolved with >=2 votes, and each item's plurality agreement
    //    is >= its pairwise agreement (plurality counts self-pairs)
    val events = Tables.events(spark, sf)
    val cons = Relational.labelConsensus(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val agree = Relational.raterAgreement(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agree.keySet === cons.filter(_._2._1 >= 2).keySet)
    agree.foreach { case (item, (n, pI)) =>
      assert(cons(item)._1 === n)
      assert(cons(item)._2 >= pI - 1e-6, s"item $item")
    }

    // 2. robust stats agree with the quantile family: q55's served
    //    median IS q30's 0.5 quantile, per group
    val med55 = Relational.q55MadOutliers(spark, sf)
      .select("event_type", "med").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val q30 = Relational.q30GroupQuantiles(spark, sf)
      .filter(col("quantile") === 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(med55 === q30)

    // 3. drift gate on a DETERMINISTIC iid split: train-vs-val halves
    //    of the same table must NOT drift (the monitor's null case) —
    //    events at sf0.01 for sampling mass (~15k+ rows per type and
    //    side; a tiny group's deciles are degenerate and its PSI
    //    legitimately noisy, which is why production monitors set a
    //    min-population gate)
    val ev01 = Relational.deterministicSplit(
      Tables.events(spark, "/root/testdata/sf0.01"), "event_id")
    val ref = ev01.filter(col("split") === "train")
    val cur = ev01.filter(col("split") =!= "train")
    val edges = Relational.referenceEdges(ref, "event_type", "value")
    val scored = Relational.psiFromCounts(
      Relational.binCounts(ref, "event_type", "value", edges),
      Relational.binCounts(cur, "event_type", "value", edges), "event_type")
    val nulls = scored.groupBy("event_type")
      .agg(sum("n_ref").as("nr"), max("psi").as("psi")).collect()
    assert(nulls.nonEmpty && nulls.forall(_.getLong(1) >= 1000L))
    nulls.foreach { r =>
      assert(r.getDouble(2) < 0.05, s"iid halves must not drift: $r")
    }

    // 4. quality routing: drop hard-to-read docs and code, tokenize
    //    what remains with the fixed table, export as shards — the
    //    manifest accounts for every kept doc exactly once
    val docs = Tables.documents(spark, sf)
    val keepIds = Text.readability(docs).filter(col("band") =!= "difficult")
      .select("doc_id")
      .join(Text.codeDetect(docs).filter(!col("is_code")).select("doc_id"), "doc_id")
    val kept = docs.join(keepIds, "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= docs.count())
    val toks = Text.bpeEncode(kept, Text.t19Merges)
    assert(toks.count() === nKept && toks.agg(min("n_tokens")).head.getLong(0) > 0)
    val out = java.nio.file.Files.createTempDirectory("graft_r11_shards").toString + "/c"
    val manifest = CorpusShards.writeShards(kept, out, shards = 4)
    assert(manifest.agg(sum("n_docs")).head.getLong(0) === nKept)
  }

  test("learned filter -> AUC/calibration/threshold evaluation composes (eval family)") {
    import graft.operators.Text
    // train the t13 classifier exactly as its gate does, then put its
    // REAL scores through the evaluation family — the deployment loop:
    // does the learned filter rank (AUC), mean what it says (ECE), and
    // hold up at the deployed cutoff (confusion)?
    val docs = Tables.documents(spark, sf)
    val feats = Text.qualityFeatures(docs, extraCols = Seq("n_chars"))
      .withColumn("label", (col("n_chars") > 306L).cast("int"))
    val w = Text.trainQualityClassifier(feats)
    val scored = Text.scoreQuality(feats, w.toSeq)
      .withColumn("grp", lit("all"))
    // discrimination: a separable-by-construction label must rank
    // far above chance
    val auc = Relational.aucScore(scored, "grp", "score", col("label") === 1)
      .collect()(0)
    assert(auc.getLong(1) > 0 && auc.getLong(2) > 0)
    assert(auc.getDouble(3) > 0.9, s"AUC = ${auc.getDouble(3)}")
    // calibration: sigmoid outputs are probabilities — ECE is defined
    // and bounded, mass conserves across bins
    val cal = Relational.calibrationReport(scored, "grp", "score",
      col("label") === 1).collect()
    assert(cal.nonEmpty)
    val ece = cal.head.getDouble(7)
    assert(ece >= 0.0 && ece <= 1.0)
    assert(cal.map(_.getLong(2)).sum === scored.count())
    // the deployed 0.5 cutoff: the confusion metrics agree with t13's
    // own pred column, cell for cell
    val conf = Relational.confusionMetrics(scored, "grp", "score",
      col("label") === 1, 0.5).collect()(0)
    val t13 = Text.t13QualityClassifier(spark, sf)
    val tp = t13.filter(col("pred") === 1L && col("label") === 1L).count()
    val nPos = t13.filter(col("label") === 1L).count()
    // q69 predicts at score >= 0.5 on the QUANTIZED score; t13's pred
    // is score > 0.5 raw — they agree except for scores landing
    // exactly on 0.50 at 2dp, which only ADD to q69's positives
    assert(conf.getLong(1) >= tp && conf.getLong(1) <= nPos)
    assert(conf.getLong(1) + conf.getLong(3) === nPos)
    assert(conf.getDouble(8) > 0.8, s"accuracy = ${conf.getDouble(8)}")
  }

  test("expectation gate -> skew-profiled salted join -> drift null case -> decay/paths/collocations compose (late-r11 surface)") {
    import graft.operators.Text

    // 1. contract gate: the audited expectations must pass before the
    //    pipeline proceeds; the uniqueness count cross-checks an
    //    independent groupBy formulation
    val orders = Tables.orders(spark, sf)
    val gate = Relational.checkExpectations(orders,
      predicates = Seq("key_non_null" -> col("o_orderkey").isNotNull),
      uniqueKeys = Seq("key_unique" -> Seq("o_orderkey")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gate.values.forall(_.getBoolean(4)), "contract must pass")
    val dupRows = orders.groupBy("o_orderkey").count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).head.getLong(0)
    assert(gate("key_unique").getLong(3) === dupRows)

    // 2. the skew profile's min_salt feeds q29's salted join, which
    //    stays row-identical to the plain join (the q29 guarantee)
    val li = Tables.lineitem(spark, sf)
    val profile = Relational.keySkewProfile(li, "l_orderkey",
      topK = 5, partitions = 32).collect()
    assert(profile.forall(_.getLong(5) >= 1L))
    val salt = profile.map(_.getLong(5)).max.toInt
    val plain = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .count()
    val salted = Relational.saltedJoin(
      li.select(col("l_orderkey").as("key"), col("l_quantity")),
      orders.select(col("o_orderkey").as("key"), col("o_totalprice")),
      "key", salt = salt).count()
    assert(salted === plain)

    // 3. drift null case on an iid split: the categorical mix of
    //    train-vs-val halves must not trip the chi-square monitor,
    //    and the numeric KS gap stays under the 5% critical value
    val ev01 = Relational.deterministicSplit(
      Tables.events(spark, "/root/testdata/sf0.01"), "event_id")
    val chi2 = Relational.chi2FromCounts(
      Relational.categoryCounts(ev01.filter(col("split") === "train"), "event_type"),
      Relational.categoryCounts(ev01.filter(col("split") =!= "train"), "event_type"))
      .collect()
    assert(chi2.nonEmpty)
    val dof = chi2.head.getLong(7)
    // 5% critical values by dof are ~dof + 2*sqrt(2*dof) + 2; iid
    // halves should sit far below — use a generous 4x dof + 10 bound
    assert(chi2.head.getDouble(6) < 4.0 * dof + 10.0,
      s"iid halves must not drift: chi2 = ${chi2.head.getDouble(6)} at dof $dof")
    // KS needs a time axis: score the two halves by relabeling split
    // membership as early/late timestamps (the operator's side rule)
    val ks = Relational.ksTest(
      ev01.withColumn("side_ts",
        when(col("split") === "train", lit(0L)).otherwise(lit(100L))),
      "event_type", "value", "side_ts").collect()
    assert(ks.nonEmpty)
    ks.foreach { r =>
      val bound = 1.358 * math.sqrt(
        (r.getLong(1) + r.getLong(2)).toDouble / (r.getLong(1) * r.getLong(2)))
      assert(r.getDouble(3) < bound,
        s"iid halves exceed the KS 5% bound: $r (bound $bound)")
    }

    // 4. recency features are convex: the decayed average lies inside
    //    each group's value hull and the weight mass never exceeds n
    val decayed = Relational.q64DecayAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val hull = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(min(expr("CAST(value AS decimal(12,2))")).cast("double").as("lo"),
        max(expr("CAST(value AS decimal(12,2))")).cast("double").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    decayed.foreach { case (k, (n, mass, avg)) =>
      assert(mass > 0.0 && mass <= n.toDouble + 1e-6)
      assert(avg >= hull(k)._1 - 1e-6 && avg <= hull(k)._2 + 1e-6, s"$k: $avg")
    }

    // 5. path mining is consistent with sessionization: no path count
    //    exceeds the session total, and every step count is positive
    val totalSessions = Relational.q13Sessionize(spark, sf).count()
    val paths = Relational.q62TopPaths(spark, sf).collect()
    assert(paths.nonEmpty)
    assert(paths.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= totalSessions))
    assert(paths.forall(_.getLong(1) >= 1L))

    // 6. collocations are internally consistent: a pair never
    //    outnumbers either of its words and the floor holds
    val coll = Text.t22Collocations(spark, sf).collect()
    assert(coll.nonEmpty)
    coll.foreach { r =>
      assert(r.getLong(1) >= 5L)
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(3) >= r.getLong(1), r.toString)
    }
  }
}
