package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit for SCALE.md (round 10): counts the join/exchange
  * node kinds in the round's new plans, so "no corpus×batch cartesian"
  * claims are measured from the executed plan, not asserted. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def audit(name: String): Unit = {
      val plan = graft.Queries.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      def n(k: String): Int = k.r.findAllIn(plan).length
      println(s"[planaudit] $name cartesian=${n("CartesianProduct")} " +
        s"bnlj=${n("BroadcastNestedLoopJoin")} bhj=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} " +
        s"exchange=${n("Exchange")} generate=${n("Generate")}")
    }
    // round-10 set + the round-11 additions. Expectations: repetition_score
    // Generate=0 with NO gram-sized exchange (the two remaining exchanges
    // are the few-file source fan-out + the final orderBy — doc-count-sized
    // narrow rows); decontaminate bhj-only vs the corpus (smj=shj=0);
    // multimodal_knn all-zero (per-row kernels + TakeOrdered).
    // ... + the round-12 additions. Expectations: multimodal_h264_sps /
    // multimodal_aac_adts all-zero joins (per-row parser kernels + one
    // orderBy exchange); dedup_semantic one bhj (the broadcast occupancy
    // guard) + the cluster-key pair shuffle, zero smj; the incremental arm
    // bhj-only against the corpus (batch broadcasts, smj=shj=0);
    // facade_ivfpq_knn zero joins (codes-only ADC scan + TakeOrdered).
    Seq("hybrid_batch_probe", "hybrid_batch", "hybrid_batch_filtered",
      "ann_pq_exact", "ann_pq_batch", "knn_batch_sq8", "tpch_q22",
      "repetition_score", "decontaminate", "multimodal_knn",
      "save_load_pq_residual",
      "multimodal_h264_sps", "multimodal_aac_adts", "multimodal_mp3_sideinfo",
      "dedup_semantic", "dedup_semantic_incremental",
      "facade_ivfpq_knn", "knn_prefilter_ivfpq",
      // round-13 additions. Expectations: multimodal_mp3_huffman all-zero
      // joins (per-row decoder kernel + one orderBy exchange); knn_graph's
      // chunked exact arm exactly ONE bnlj (the deliberate brute-force
      // broadcast of the bounded query chunk — not a planner accident)
      // with zero smj/shj and no corpus-sized exchange.
      "multimodal_mp3_huffman", "knn_graph",
      // round-14 additions. Expectations: the three AAC gates and the MP3
      // pcm/codebook + H264 ipcm gates all-zero joins (per-row codec
      // kernels + one orderBy exchange); dedup_semantic_trained the same
      // 1-bhj + cluster-shuffle shape as dedup_semantic (the trained
      // centroids are a driver-side array, invisible to the plan).
      "multimodal_aac_spectra", "multimodal_aac_pcm",
      "multimodal_aac_codebook", "multimodal_mp3_pcm",
      "multimodal_mp3_codebook", "multimodal_h264_ipcm",
      "dedup_semantic_trained",
      // round-15 additions. Expectations: every new codec gate all-zero
      // joins (per-row kernels + one orderBy exchange) — the window-
      // switched/KBD/TNS/pulse AAC chains, the MP3 short/mixed/intensity
      // chains, and the H264 CAVLC luma/chroma pictures all decode
      // inside mapPartitions.
      "multimodal_aac_short", "multimodal_aac_cpe", "multimodal_aac_kbd",
      "multimodal_aac_tns", "multimodal_aac_pulse",
      "multimodal_mp3_short", "multimodal_mp3_mixed",
      "multimodal_mp3_intensity", "multimodal_mp3_reservoir",
      "multimodal_h264_i16x16", "multimodal_h264_i16_chroma",
      // round-16 additions. Expectations: the codec/container gates all
      // zero joins (per-row kernels + one orderBy exchange — I4x4,
      // CABAC, the MP4/M4A container walks and the interleaved-chunk
      // twins, MP3 mixed intensity, AAC IS); ann_graph_sampled shares
      // ann_graph's shape plus the broadcast of the 4-row md5-selected
      // query set (bhj, no cartesian).
      "multimodal_mp3_intensity_mixed", "multimodal_h264_i4x4",
      "multimodal_h264_cabac", "multimodal_h264_cabac_core",
      "multimodal_mp4_h264", "multimodal_mp4_aac",
      "multimodal_mp4_chunks_h264", "multimodal_mp4_chunks_aac",
      "multimodal_aac_is", "ann_graph_sampled",
      // round-17 additions. Expectations: keyframes/frag/i8x8 all-zero
      // joins (per-row container+codec kernels + one orderBy exchange);
      // media_pipeline_knn JOIN-FREE until the final KNN — exactly one
      // broadcast join (bhj or bnlj on the inequality predicate) over
      // the frame set, zero cartesian/smj/shj, then the window top-1.
      "multimodal_mp4_keyframes", "multimodal_mp4_frag_h264",
      "multimodal_mp4_frag_aac", "multimodal_h264_i8x8",
      "media_pipeline_knn",
      // round-17 timestamp + multi-slice batch: all per-row kernels,
      // zero joins, one orderBy exchange each
      "multimodal_mp4_timestamps", "multimodal_mp4_ctts",
      "multimodal_mp4_frag_timestamps", "multimodal_h264_multislice",
      "multimodal_h264_multislice_cabac",
      "multimodal_mp4_gapless", "multimodal_h264_scaling",
      "multimodal_h264_stream").foreach(audit)
    spark.stop()
  }
}
