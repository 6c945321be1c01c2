package graft

/** Dev utility (r18): per-phase anatomy of the x05 write workload —
  * where do the 255 per-table jobs actually spend their time once the
  * codegen cache is warm? Phases timed per table (serial, so phases
  * don't overlap): DataFrame construction+analysis, physical planning,
  * noop execution, parquet write+commit. Then pooled wall totals for
  * noop-only vs full write at the session's core count.
  * Usage: runMain graft.X05Anatomy [nSerialTables]
  */
object X05Anatomy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nSerial = args.headOption.map(_.toInt).getOrElse(40)
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), Some(sfDir))
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm everything the way a bench rep sees it
    val (_, w1) = t(graft.SparkEntry.queries("x05_xbrl_full_extract")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    val (_, w2) = t(graft.SparkEntry.queries("x05_xbrl_full_extract")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    println(f"[anatomy] full x05 cold=$w1%.2f warm=$w2%.2f")

    val tables = graft.operators.XbrlQueries.tableSchemas
    val st = graft.operators.XbrlQueries.sharedStore(spark)
    val out = new java.io.File("/tmp/x05_anatomy"); out.mkdirs()

    var (tb, tp, tn, tw) = (0.0, 0.0, 0.0, 0.0)
    tables.take(nSerial).foreach { sch =>
      val (df, b) = t(graft.plans.FactTableBuilder.buildFromStore(sch, st))
      val (_, p) = t(df.queryExecution.executedPlan)
      val (_, n) = t(df.write.format("noop").mode("overwrite").save())
      val (_, w) = t(df.coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/${sch.name}.parquet"))
      tb += b; tp += p; tn += n; tw += w
    }
    println(f"[anatomy] serial n=$nSerial: build=$tb%.2f plan=$tp%.2f noopExec=$tn%.2f parquetWrite=$tw%.2f (sums)")

    // pooled: all 255 noop only
    def pooled(write: Boolean): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val (_, wall) = t {
        val fs = tables.map { sch => scala.concurrent.Future {
          val df = graft.plans.FactTableBuilder.buildFromStore(sch, st)
          if (write) df.coalesce(1).write.mode("overwrite")
            .parquet(s"/tmp/x05_anatomy/p_${sch.name}.parquet")
          else df.write.format("noop").mode("overwrite").save()
        } }
        scala.concurrent.Await.result(scala.concurrent.Future.sequence(fs),
          scala.concurrent.duration.Duration.Inf)
      }
      pool.shutdown()
      wall
    }
    println(f"[anatomy] pooled32 noop all255:  ${pooled(false)}%.2f s (rep2 ${pooled(false)}%.2f)")
    println(f"[anatomy] pooled32 write all255: ${pooled(true)}%.2f s (rep2 ${pooled(true)}%.2f)")

    // hypothesis splits --------------------------------------------------
    def pooledRun(label: String)(job: graft.xbrl.TableSchema => Unit): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val (_, wall) = t {
        scala.concurrent.Await.result(scala.concurrent.Future.sequence(
          tables.map { sch => scala.concurrent.Future { job(sch) } }),
          scala.concurrent.duration.Duration.Inf)
      }
      pool.shutdown()
      println(f"[anatomy] $label: $wall%.2f s")
    }
    // A: raw store scan, no per-table projection (same 255 jobs)
    pooledRun("A rawstore-noop")(_ => st.write.format("noop").mode("overwrite").save())
    pooledRun("A2 rawstore-noop rep2")(_ => st.write.format("noop").mode("overwrite").save())
    // B: projection via RDD count (no SQL write command machinery)
    pooledRun("B proj-rdd-count") { sch =>
      val df = graft.plans.FactTableBuilder.buildFromStore(sch, st)
      df.queryExecution.toRdd.count(); ()
    }
    // C: full projection noop with whole-stage codegen OFF
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    pooledRun("C proj-noop nocodegen") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, st)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // D: single-thread serial noop of 20 tables for per-job wall
    val (_, dWall) = t {
      tables.take(20).foreach { sch =>
        graft.plans.FactTableBuilder.buildFromStore(sch, st)
          .write.format("noop").mode("overwrite").save()
      }
    }
    println(f"[anatomy] D serial20 proj-noop: $dWall%.2f s")

    // E: lineage-truncated store (localCheckpoint) — small task binaries
    val (stc, ckptT) = t(st.localCheckpoint())
    println(f"[anatomy] E localCheckpoint build: $ckptT%.2f s")
    pooledRun("E ckpt proj-noop") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .write.format("noop").mode("overwrite").save()
    }
    pooledRun("E2 ckpt proj-noop rep2") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .write.format("noop").mode("overwrite").save()
    }
    // F: ckpt + AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    pooledRun("F ckpt noop aqe-off") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // G: ckpt parquet writes (commit v1)
    pooledRun("G ckpt write") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/g_${sch.name}.parquet")
    }
    // H: ckpt parquet writes, committer algorithm 2
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    pooledRun("H ckpt write commitV2") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/h_${sch.name}.parquet")
    }
    pooledRun("H2 ckpt write commitV2 rep2") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/h_${sch.name}.parquet")
    }
    // I/J: pool width sweep on the ckpt write path
    def pooledN(label: String, n: Int)(job: graft.xbrl.TableSchema => Unit): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val (_, wall) = t {
        scala.concurrent.Await.result(scala.concurrent.Future.sequence(
          tables.map { sch => scala.concurrent.Future { job(sch) } }),
          scala.concurrent.duration.Duration.Inf)
      }
      pool.shutdown()
      println(f"[anatomy] $label: $wall%.2f s")
    }
    for (n <- Seq(64, 128)) pooledN(s"I ckpt write pool$n", n) { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/i${n}_${sch.name}.parquet")
    }
    // K: write + observe (the real x05 shape)
    pooledRun("K ckpt write+observe") { sch =>
      val obs = org.apache.spark.sql.Observation()
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1)
        .observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/k_${sch.name}.parquet")
      obs.get("n"); ()
    }
    // L: task-time vs wall accounting for the write jobs
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    val jobWall = new java.util.concurrent.atomic.AtomicLong(0)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(te.taskInfo.duration); taskCount.incrementAndGet(); ()
      }
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(js.jobId, js.time); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStarts.remove(je.jobId)).foreach(s => jobWall.addAndGet(je.time - s)); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    pooledRun("L ckpt write instrumented") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/x05_anatomy/l_${sch.name}.parquet")
    }
    Thread.sleep(1500) // listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"[anatomy] L tasks=${taskCount.get} sumTaskTime=${taskTime.get / 1000.0}%.2f s sumJobWall=${jobWall.get / 1000.0}%.2f s")
    // M: same writes to /dev/shm (filesystem latency check)
    new java.io.File("/dev/shm/x05_anatomy").mkdirs()
    pooledRun("M ckpt write shm") { sch =>
      graft.plans.FactTableBuilder.buildFromStore(sch, stc)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/dev/shm/x05_anatomy/m_${sch.name}.parquet")
    }
    spark.stop()
  }
}
