package graft.core

/** Driver-main logging hygiene.
  *
  * The engine's bounded-offset analytics windows (`ext/AnalyticsOps
  * .scala`) deliberately run a handful of windows with no partition
  * spec: each one consumes a frame already pre-aggregated to at most
  * `spark.sql.shuffle.partitions` rows, so funneling it through one
  * reducer is the cheapest correct plan, not a scale hazard (the design
  * is documented at each site and PlanAuditSpec pins the registry-wide
  * no-unpartitioned-window sweep to exactly those audited exceptions).
  * `WindowExec` still logs a per-execution
  * "No Partition Defined for Window operation!" WARN for them, and in
  * the official bench/verify runs that spam competes with the compact
  * result line for the driver's bounded stdout tail capture — the same
  * budget hazard class as the `SimpleFunctionRegistry` WARN
  * (`functions/Registration.scala`). The warning is demoted to ERROR
  * threshold for that one logger, in the driver mains only: plans are
  * untouched (a constant partition spec would swap the
  * SinglePartition exchange for a hash exchange in every audited
  * plan), and interactive/test sessions keep the default so a NEW
  * unpartitioned window still warns where a developer is looking.
  */
object Logs {

  /** Raise the `WindowExec` logger threshold to ERROR — call after the
    * session is built (Spark's own log4j2 configuration must already be
    * installed, or the override is re-applied over the bootstrap
    * config).
    */
  def suppressBoundedWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Raise the thresholds of the three per-streaming-query-start WARN
    * sources to ERROR — the same tail-budget hazard class as
    * `WindowExec`, fired by every `writeStream.start()` in the driver
    * mains (each streaming certificate starts 2+ queries, so the
    * official run's tail carried 3 such lines in round 14):
    *
    *  - `ResolveWriteToStream` — "spark.sql.adaptive.enabled is not
    *    supported in streaming DataFrames/Datasets and will be
    *    disabled": expected and deliberate; the mains enable AQE for
    *    the BATCH queries, and Spark documentedly disables it per
    *    streaming query — there is nothing to act on;
    *  - `MicroBatchExecution` — the same AQE-disabled notice repeated
    *    at execution start;
    *  - `SharedInMemoryCache` — file-listing cache eviction under the
    *    default 250 MB budget: a sizing notice, not a correctness
    *    signal, and at bench scale eviction only means re-listing a
    *    staged landing dir;
    *  - `ChecksumCheckpointFileManager` — "No checksum file found …
    *    hence no checksum verification" per state snapshot/delta file
    *    written before checksumming was enabled (or by a replay
    *    harness restart): a per-file notice that fired 80× in the
    *    first round-15 full run, 3 of them inside the last 2 KB;
    *  - the `…streaming.state` PACKAGE — `HDFSBackedStateStoreProvider`'s
    *    "state for version N doesn't exist in loadedMaps … normal for
    *    the first batch of starting query" notice (self-described as
    *    normal, fired per state partition on every checkpoint-restart
    *    replay) comes from a DYNAMIC logger name suffixed with the
    *    provider id (`HDFSBackedStateStoreProvider
    *    StateStoreProviderId[ storeId=… ]`), so an exact-class
    *    threshold never matches it — verified in the second round-15
    *    full run, where the class-name entry left all 16 lines in
    *    place. The package logger is the nearest addressable ancestor;
    *    it also covers the other state-store notice spam in the same
    *    package, which in the driver mains is the same
    *    nothing-to-act-on class.
    *
    * Driver mains (Bench/Verify) only — interactive and test sessions
    * keep the defaults so a developer still sees all of these where
    * they are looking.
    *
    * The first four are EXACT-CLASS thresholds on sources whose WARNs
    * are individually vetted as nothing-to-act-on, safe in both mains.
    * The `…streaming.state` PACKAGE threshold is deliberately NOT here:
    * a package-wide ERROR floor also hides actionable state-store
    * warnings (e.g. maintenance/snapshot-upload failures), which must
    * stay visible in Verify — the correctness gate. Bench, whose
    * compact stdout line is the tail-budget hazard the suppression
    * exists for, additionally calls
    * [[suppressStateStoreNoticeWarns]].
    */
  def suppressStreamingMainWarns(): Unit =
    Seq(
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
      "org.apache.spark.sql.execution.datasources.SharedInMemoryCache",
      "org.apache.spark.sql.execution.streaming.checkpointing.ChecksumCheckpointFileManager"
    ).foreach(l => org.apache.logging.log4j.core.config.Configurator.setLevel(
      l, org.apache.logging.log4j.Level.ERROR))

  /** Bench-only: raise the `…streaming.state` PACKAGE to ERROR. The
    * package logger is the nearest addressable ancestor of
    * `HDFSBackedStateStoreProvider`'s dynamically-named per-store
    * loggers (name suffixed with the StoreId — an exact-class
    * threshold never matches, verified in the second round-15 full
    * run), whose "state for version N doesn't exist in loadedMaps …
    * normal for the first batch" notice fires per state partition on
    * every checkpoint-restart replay and competes with the compact
    * result line for the driver's bounded stdout tail. The cost — any
    * genuinely actionable state-store WARN is also hidden — is
    * acceptable only where the tail budget is the point; Verify keeps
    * the default threshold for this package (round-15 advice).
    */
  def suppressStateStoreNoticeWarns(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.state",
      org.apache.logging.log4j.Level.ERROR)
}
