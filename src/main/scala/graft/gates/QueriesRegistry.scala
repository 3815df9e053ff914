package graft

import graft.dedup.Dedup
import graft.expr.ExactSum
import graft.functions.VectorFunctions._
import graft.text.{BM25, TextAnalysis}
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The gate registry: every operator name -> (Spark plan, DuckDB oracle SQL). Split from Queries.scala by tier in round 12 (r11 VERDICT #7) behind the same map - zero behavior change.
  *
  * One tier of [[Queries]] (split in round 12, r11 VERDICT #7 -
  * maintainability only): members keep their original relative order and
  * semantics, relaxed from `private` to `private[graft]` so the sibling
  * tier traits and the assembling object see them. The self-type gives
  * every tier access to the full mixed-in surface without a dependency
  * graph between the files. */
private[graft] trait QueriesRegistry { this: Queries.type =>

  // ---------------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------------

  /** The mp4-h264 container oracle (round 16), parameterized by the
    * doc_id bound so the single-track and INTERLEAVED-chunk gates share
    * it verbatim — the container layout is exactly what those gates
    * differ in, and any slicing slip changes the pixels. */
  private[graft] def mp4H264PlanesCte(nIds: Int, sms: String): String =
    s"""WITH RECURSIVE ids AS (
           |  SELECT doc_id AS id, sm.sm, 2 * doc_id + sm.sm AS eid
           |  FROM documents, (SELECT unnest($sms) AS sm) sm
           |  WHERE doc_id < $nIds),
           |qps AS (SELECT id, sm, eid, 20 + (5*eid) % 12 AS qp0,
           |  20 + (5*eid) % 12 + (eid+1)%5 - 2 AS qp1,
           |  20 + (5*eid) % 12 + (eid+1)%5 - 2 + (eid+2)%5 - 2 AS qp2,
           |  20 + (5*eid) % 12 + (eid+1)%5 - 2 + (eid+2)%5 - 2 + (eid+3)%5 - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |geo AS (
           |  SELECT i.id, i.sm, i.eid, k.k, 1 + k.k // 16 AS m, k.k % 16 AS blk,
           |    2*((k.k % 16 // 4) % 2) + (k.k % 16 % 4) % 2 AS bx,
           |    2*((k.k % 16 // 4) // 2) + (k.k % 16 % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 48)) AS k) k),
           |geo2 AS (
           |  SELECT id, sm, eid, k, m, blk, 4*(m % 2) + bx AS gx, 4*(m // 2) + by AS gy,
           |    CASE WHEN m = 1 AND by = 0 THEN
           |           (CASE (eid + blk) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 8 END)
           |         WHEN m = 2 AND bx = 0 THEN
           |           (CASE (eid + blk) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 7 END)
           |         WHEN m = 2 THEN (eid + 1 + blk) % 9
           |         ELSE (eid + blk) % 9 END AS md
           |  FROM geo),
           |geoq AS (
           |  SELECT g.*,
           |    g.gy > 0 AND g.gx + 1 < 8 AND
           |      (((g.gy-1) // 4)*2 + (g.gx+1) // 4)*16
           |        + 4*(2*(((g.gy-1) % 4) // 2) + ((g.gx+1) % 4) // 2)
           |        + 2*(((g.gy-1) % 4) % 2) + ((g.gx+1) % 4) % 2
           |      < ((g.gy // 4)*2 + g.gx // 4)*16
           |        + 4*(2*((g.gy % 4) // 2) + (g.gx % 4) // 2)
           |        + 2*((g.gy % 4) % 2) + (g.gx % 4) % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id AND q.sm = g.sm),
           |dq AS (SELECT g.id, g.sm, g.k,
           |    list_transform(range(0, 16), ri ->
           |      (CASE WHEN (g.eid + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 7 = 0
           |            THEN ((g.eid + g.m * ((list_position(c.zz, ri) - 1) + 2) + g.blk) % 5) - 2
           |            ELSE 0 END)
           |      * c.v[g.qp % 6 + 1]
           |           [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                 WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                 ELSE 3 END]
           |      * CAST(pow(2, g.qp // 6) AS BIGINT)) AS d
           |  FROM geoq g, cst c),
           |it1 AS (SELECT id, sm, k,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, sm, k,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |walk AS (
           |  SELECT id, sm, 0 AS k, list_transform(range(0, 1024), i -> 128) AS p FROM ids
           |  UNION ALL
           |  SELECT s.id, s.sm, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 4 = s.gx AND (i // 32) // 4 = s.gy THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.tp[(i%32)%4 + 2]
           |            WHEN 1 THEN s.lp[(i//32)%4 + 2]
           |            WHEN 2 THEN
           |              CASE WHEN s.gx > 0 AND s.gy > 0 THEN
           |                (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+4)//8
           |              WHEN s.gx > 0 THEN (s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+2)//4
           |              WHEN s.gy > 0 THEN (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+2)//4
           |              ELSE 128 END
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%4 = 3 AND (i//32)%4 = 3
           |                THEN (s.tp[8] + 3*s.tp[9] + 2)//4
           |                ELSE (s.tp[(i%32)%4 + (i//32)%4 + 2]
           |                    + 2*s.tp[(i%32)%4 + (i//32)%4 + 3]
           |                    + s.tp[(i%32)%4 + (i//32)%4 + 4] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%4 > (i//32)%4 THEN
           |                (s.tp[(i%32)%4 - (i//32)%4] + 2*s.tp[(i%32)%4 - (i//32)%4 + 1]
           |                 + s.tp[(i%32)%4 - (i//32)%4 + 2] + 2)//4
           |              WHEN (i%32)%4 < (i//32)%4 THEN
           |                (s.lp[(i//32)%4 - (i%32)%4] + 2*s.lp[(i//32)%4 - (i%32)%4 + 1]
           |                 + s.lp[(i//32)%4 - (i%32)%4 + 2] + 2)//4
           |              ELSE (s.tp[2] + 2*s.tp[1] + s.lp[2] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%4) - (i//32)%4 >= 0
           |                    AND (2*((i%32)%4) - (i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i%32)%4) - (i//32)%4 >= 1 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2]
           |                 + 2*s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i%32)%4) - (i//32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.lp[(i//32)%4 + 1] + 2*s.lp[(i//32)%4]
           |                    + s.lp[(i//32)%4 - 1] + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%4) - (i%32)%4 >= 0
           |                    AND (2*((i//32)%4) - (i%32)%4) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i//32)%4) - (i%32)%4 >= 1 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2]
           |                 + 2*s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i//32)%4) - (i%32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.tp[(i%32)%4 + 1] + 2*s.tp[(i%32)%4]
           |                    + s.tp[(i%32)%4 - 1] + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 3] + 1)//2
           |              ELSE (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + 2*s.tp[(i%32)%4 + ((i//32)%4)//2 + 3]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 4] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%4 + 2*((i//32)%4) > 5 THEN s.lp[5]
           |              WHEN (i%32)%4 + 2*((i//32)%4) = 5 THEN (s.lp[4] + 3*s.lp[5] + 2)//4
           |              WHEN ((i%32)%4 + 2*((i//32)%4)) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 3] + 1)//2
           |              ELSE (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + 2*s.lp[(i//32)%4 + ((i%32)%4)//2 + 3]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 4] + 2)//4 END
           |          END) + s.r[4*((i//32)%4) + (i%32)%4 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT w.id, w.sm, w.k, w.p, g.gx, g.gy, g.md, r.r,
           |      list_transform(range(-1, 8), xx ->
           |        CASE WHEN g.gy = 0 THEN 0
           |             WHEN xx = -1 THEN
           |               (CASE WHEN g.gx = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             WHEN xx > 3 AND NOT g.htr THEN w.p[(4*g.gy - 1)*32 + 4*g.gx + 4]
           |             ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx + xx + 1] END) AS tp,
           |      list_transform(range(-1, 4), yy ->
           |        CASE WHEN g.gx = 0 THEN 0
           |             WHEN yy = -1 THEN
           |               (CASE WHEN g.gy = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             ELSE w.p[(4*g.gy + yy)*32 + 4*g.gx] END) AS lp
           |    FROM walk w
           |    JOIN geoq g ON g.id = w.id AND g.sm = w.sm AND g.k = w.k
           |    JOIN res4 r ON r.id = w.id AND r.sm = w.sm AND r.k = w.k
           |    WHERE w.k < 48
           |  ) s),
           |fin AS (SELECT id, sm, p FROM walk WHERE k = 48)""".stripMargin

  /** Oracle for the MULTI-SLICE gates (round 17): slice 0 = {mb0, an
    * I16 DC MB flat at a closed-form §8.5.10 DC value}, slice 1 =
    * {mb1..mb3, I4x4} restated by the same recursive plane walk as the
    * single-slice oracles but with SLICE-BOUND availability — a
    * neighbor cell inside mb0 is unavailable (lav/tav/cav/htr exclude
    * the mb0 region), exactly like the picture edge. `cabacFlag` only
    * stamps the entropy column: both coders decode to identical
    * pixels (the cross-coder contract), so the twin gates share this
    * restatement. */
  private[graft] def multiSliceOracleSql(nIds: Int, cabacFlag: Int): String =
    raw"""WITH RECURSIVE ids AS (
           |  SELECT doc_id AS id, doc_id AS eid FROM documents WHERE doc_id < $nIds),
           |qps AS (SELECT id, eid,
           |  26 + (eid % 5) - 2 + ((eid+1) % 5) - 2 AS qp0,
           |  26 + ((eid+2) % 5) - 2 + ((eid+3) % 5) - 2 AS qp1,
           |  26 + ((eid+2) % 5) - 2 + ((eid+3) % 5) - 2 + ((eid+4) % 5) - 2 AS qp2,
           |  26 + ((eid+2) % 5) - 2 + ((eid+3) % 5) - 2 + ((eid+4) % 5) - 2
           |     + ((eid+1) % 5) - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v,
           |  [1,2,8] AS mrow, [0,2,3,7] AS mcol, [0,1,2,3,7,8] AS mc3),
           |geo AS (
           |  SELECT i.id, i.eid, k.k, 1 + k.k // 16 AS m, k.k % 16 AS blk,
           |    2*((k.k % 16 // 4) % 2) + (k.k % 16 % 4) % 2 AS bx,
           |    2*((k.k % 16 // 4) // 2) + (k.k % 16 % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 48)) AS k) k),
           |geo2 AS (
           |  SELECT g.id, g.eid, g.k, g.m, g.blk,
           |    4*(g.m % 2) + g.bx AS gx, 4*(g.m // 2) + g.by AS gy,
           |    CASE WHEN g.m <= 2 AND g.bx = 0 AND g.by = 0 THEN 2
           |         WHEN g.m <= 2 AND g.by = 0 THEN c.mrow[(g.eid + g.blk) % 3 + 1]
           |         WHEN g.m <= 2 AND g.bx = 0 THEN c.mcol[(g.eid + g.blk) % 4 + 1]
           |         WHEN g.m = 3 AND g.bx = 0 AND g.by = 0
           |           THEN c.mc3[(g.eid + g.blk) % 6 + 1]
           |         ELSE (g.eid + g.blk) % 9 END AS md
           |  FROM geo g, cst c),
           |geoq AS (
           |  SELECT g.*,
           |    g.gx > 0 AND NOT (g.gx <= 4 AND g.gy <= 3) AS lav,
           |    g.gy > 0 AND NOT (g.gy <= 4 AND g.gx <= 3) AS tav,
           |    g.gx > 0 AND g.gy > 0 AND NOT (g.gx <= 4 AND g.gy <= 4) AS cav,
           |    g.gy > 0 AND g.gx + 1 < 8 AND NOT (g.gx <= 2 AND g.gy <= 4) AND
           |      (((g.gy-1) // 4)*2 + (g.gx+1) // 4)*16
           |        + 4*(2*(((g.gy-1) % 4) // 2) + ((g.gx+1) % 4) // 2)
           |        + 2*(((g.gy-1) % 4) % 2) + ((g.gx+1) % 4) % 2
           |      < ((g.gy // 4)*2 + g.gx // 4)*16
           |        + 4*(2*((g.gy % 4) // 2) + (g.gx % 4) // 2)
           |        + 2*((g.gy % 4) % 2) + (g.gx % 4) % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id),
           |dq AS (SELECT g.id, g.k,
           |    list_transform(range(0, 16), ri ->
           |      (CASE WHEN (g.eid + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 7 = 0
           |            THEN ((g.eid + g.m * ((list_position(c.zz, ri) - 1) + 2) + g.blk) % 5) - 2
           |            ELSE 0 END)
           |      * c.v[g.qp % 6 + 1]
           |           [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                 WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                 ELSE 3 END]
           |      * CAST(pow(2, g.qp // 6) AS BIGINT)) AS d
           |  FROM geoq g, cst c),
           |it1 AS (SELECT id, k,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, k,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |walk AS (
           |  SELECT id, 0 AS k, list_transform(range(0, 1024), i -> 128) AS p FROM ids
           |  UNION ALL
           |  SELECT s.id, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 4 = s.gx AND (i // 32) // 4 = s.gy THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.tp[(i%32)%4 + 2]
           |            WHEN 1 THEN s.lp[(i//32)%4 + 2]
           |            WHEN 2 THEN
           |              CASE WHEN s.lav AND s.tav THEN
           |                (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+4)//8
           |              WHEN s.lav THEN (s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+2)//4
           |              WHEN s.tav THEN (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+2)//4
           |              ELSE 128 END
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%4 = 3 AND (i//32)%4 = 3
           |                THEN (s.tp[8] + 3*s.tp[9] + 2)//4
           |                ELSE (s.tp[(i%32)%4 + (i//32)%4 + 2]
           |                    + 2*s.tp[(i%32)%4 + (i//32)%4 + 3]
           |                    + s.tp[(i%32)%4 + (i//32)%4 + 4] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%4 > (i//32)%4 THEN
           |                (s.tp[(i%32)%4 - (i//32)%4] + 2*s.tp[(i%32)%4 - (i//32)%4 + 1]
           |                 + s.tp[(i%32)%4 - (i//32)%4 + 2] + 2)//4
           |              WHEN (i%32)%4 < (i//32)%4 THEN
           |                (s.lp[(i//32)%4 - (i%32)%4] + 2*s.lp[(i//32)%4 - (i%32)%4 + 1]
           |                 + s.lp[(i//32)%4 - (i%32)%4 + 2] + 2)//4
           |              ELSE (s.tp[2] + 2*s.tp[1] + s.lp[2] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%4) - (i//32)%4 >= 0
           |                    AND (2*((i%32)%4) - (i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i%32)%4) - (i//32)%4 >= 1 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2]
           |                 + 2*s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i%32)%4) - (i//32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.lp[(i//32)%4 + 1] + 2*s.lp[(i//32)%4]
           |                    + s.lp[(i//32)%4 - 1] + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%4) - (i%32)%4 >= 0
           |                    AND (2*((i//32)%4) - (i%32)%4) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i//32)%4) - (i%32)%4 >= 1 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2]
           |                 + 2*s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i//32)%4) - (i%32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.tp[(i%32)%4 + 1] + 2*s.tp[(i%32)%4]
           |                    + s.tp[(i%32)%4 - 1] + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 3] + 1)//2
           |              ELSE (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + 2*s.tp[(i%32)%4 + ((i//32)%4)//2 + 3]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 4] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%4 + 2*((i//32)%4) > 5 THEN s.lp[5]
           |              WHEN (i%32)%4 + 2*((i//32)%4) = 5 THEN (s.lp[4] + 3*s.lp[5] + 2)//4
           |              WHEN ((i%32)%4 + 2*((i//32)%4)) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 3] + 1)//2
           |              ELSE (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + 2*s.lp[(i//32)%4 + ((i%32)%4)//2 + 3]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 4] + 2)//4 END
           |          END) + s.r[4*((i//32)%4) + (i%32)%4 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT w.id, w.k, w.p, g.gx, g.gy, g.md, g.lav, g.tav, r.r,
           |      list_transform(range(-1, 8), xx ->
           |        CASE WHEN NOT g.tav THEN 0
           |             WHEN xx = -1 THEN
           |               (CASE WHEN NOT g.cav THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             WHEN xx > 3 AND NOT g.htr THEN w.p[(4*g.gy - 1)*32 + 4*g.gx + 4]
           |             ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx + xx + 1] END) AS tp,
           |      list_transform(range(-1, 4), yy ->
           |        CASE WHEN NOT g.lav THEN 0
           |             WHEN yy = -1 THEN
           |               (CASE WHEN NOT g.cav THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             ELSE w.p[(4*g.gy + yy)*32 + 4*g.gx] END) AS lp
           |    FROM walk w
           |    JOIN geoq g ON g.id = w.id AND g.k = w.k
           |    JOIN res4 r ON r.id = w.id AND r.k = w.k
           |    WHERE w.k < 48
           |  ) s),
           |fin AS (SELECT id, p FROM walk WHERE k = 48),
           |mb0v AS (SELECT q.id, q.qp0,
           |    greatest(0, least(255, 128 +
           |      ((((3 + q.eid % 4) * 16 * c.v[q.qp0 % 6 + 1][1]
           |         + CAST(pow(2, 5 - q.qp0 // 6) AS BIGINT))
           |        // CAST(pow(2, 6 - q.qp0 // 6) AS BIGINT)) + 32) // 64)) AS l0
           |  FROM qps q, cst c),
           |mb0 AS (SELECT id, 0 AS mb, 0 AS slc, 0 AS is_i4x4,
           |    CAST(2 AS BIGINT) AS mode_sum, qp0 AS qp,
           |    l0 * 256 AS sum_luma,
           |    l0 * (SELECT list_sum(list_transform(range(0, 256), j ->
           |      (j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    l0 AS min_luma, l0 AS max_luma
           |  FROM mb0v),
           |msum AS (SELECT id, m, SUM((blk + 1) * md) AS mode_sum
           |         FROM geoq GROUP BY id, m),
           |mbrows AS (
           |  SELECT f.id, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.mb, 1 AS slc, 1 AS is_i4x4, ms.mode_sum,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id)
           |SELECT id, mb::INT AS mb, slc::INT AS slc,
           |  $cabacFlag::INT AS entropy_cabac, is_i4x4::INT AS is_i4x4,
           |  mode_sum::BIGINT AS mode_sum, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, mb""".stripMargin

  private[graft] def mp4H264OracleSql(nIds: Int, sms: String = "range(0, 2)"): String =
    mp4H264PlanesCte(nIds, sms) + "," + s"""
           |msum AS (SELECT id, sm, m, SUM((blk + 1) * md) AS mode_sum
           |         FROM geoq GROUP BY id, sm, m),
           |mbrows AS (
           |  SELECT f.id, f.sm, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.sm, r.mb, 1 AS is_i4x4, ms.mode_sum,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.sm = r.sm AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id AND q.sm = r.sm),
           |mb0 AS (
           |  SELECT id, sm, 0 AS mb, 0 AS is_i4x4, 2 AS mode_sum,
           |    qp0 AS qp, 128 * 256 AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j ->
           |      128 * ((j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    128 AS min_luma, 128 AS max_luma
           |  FROM qps)
           |SELECT id, sm::INT AS sample, mb::INT AS mb, 0::INT AS entropy_cabac,
           |  (CASE WHEN id % 2 = 0 THEN 4 ELSE 2 END)::INT AS nal_len_size,
           |  is_i4x4::INT AS is_i4x4, mode_sum::BIGINT AS mode_sum, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, sample, mb""".stripMargin

  /** The mp4-aac container oracle (round 16), same sharing contract. */
  private[graft] def mp4AacOracleSql(nIds: Int): String =
    s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < $nIds),
           |fs AS (SELECT unnest(range(0, 2)) AS f),
           |par AS (SELECT id, f, 96 + (id + 5*f) % 8 AS gg FROM ids, fs),
           |co AS (SELECT p.id, p.f, d.i,
           |         CASE WHEN d.i >= 256 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i + p.f) % 5 < 2 THEN -1 ELSE 1 END)
           |           * ((p.id + d.i + 7*p.f) % 3) END AS q,
           |         p.gg + (p.id + 3*(d.i // 32) + p.f) % 9 - 4 AS sf
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d),
           |nz AS (SELECT id, f, list(struct_pack(k := i,
           |           v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100)))
           |         ORDER BY i) AS l
           |       FROM co WHERE q != 0 GROUP BY id, f),
           |zz AS (SELECT z.id, z.f, d.n,
           |         sin(pi()/2048.0 * (d.n + 0.5)) *
           |         (list_sum(list_transform(z.l, s ->
           |            s.v * cos(pi()/1024.0 * (d.n + 512.5) * (s.k + 0.5)))) / 1024.0) AS z
           |       FROM nz z, (SELECT unnest(range(0, 2048)) AS n) d),
           |pcm AS (SELECT a.id, a.f, a.n,
           |          greatest(-32768, least(32767, CAST(floor(
           |            (a.z + COALESCE(b.z, 0.0)) * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM zz a LEFT JOIN zz b
           |          ON b.id = a.id AND b.f = a.f - 1 AND b.n = a.n + 1024
           |        WHERE a.n < 1024)
           |SELECT id, 0::INT AS channel, (id % 13)::INT AS rate_idx,
           |  1::INT AS channels, 2::INT AS n_frames, count(*)::INT AS n_samples,
           |  CAST(sum(CASE WHEN p = 32767 OR p = -32768 THEN 1 ELSE 0 END) AS INT) AS n_clipped,
           |  CAST(sum(CASE WHEN p != 0 THEN 1 ELSE 0 END) AS INT) AS n_nonzero,
           |  CAST(sum(p) AS BIGINT) AS sum_pcm, CAST(sum(abs(p)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(p * (f * 1024 + n + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm GROUP BY id ORDER BY id""".stripMargin

  val registry: Seq[(String, Q)] = Seq(
    "knn_l2" -> Q(knnL2, Some(knnSql(7, 10))),
    "knn_cosine" -> Q(knnCosine, Some(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 42)
         |SELECT e.vec_id AS id,
         |       round(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * q.qv[i]))
         |             / (sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
         |                * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))), 4) AS score
         |FROM embeddings e, q
         |ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "knn_prefilter" -> Q(knnPreFilter, Some(knnSql(7, 5, "WHERE e.label = 3"))),
    "knn_prefilter_faithful" -> Q(knnPreFilterFaithful, Some(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
         |top AS (
         |  SELECT e.vec_id AS id, e.label,
         |         round(1.0/(1.0 + $sqDistSql), 4) AS score
         |  FROM embeddings e, q
         |  ORDER BY 1.0/(1.0 + $sqDistSql) DESC, id LIMIT 20)
         |SELECT id, score FROM top WHERE label = 3 ORDER BY score DESC, id""".stripMargin)),
    "ann_ivf" -> Q(annIvf, Some(knnSql(13, 10))),
    "ann_sq8" -> Q(annSq8, Some(knnSql(17, 10))),
    "ann_ivf_sq8" -> Q(annIvfSq8, Some(knnSql(37, 10))),
    "save_load_sq8_knn" -> Q(saveLoadSq8Knn, Some(knnSql(21, 10))),
    "ann_ivf_cosine" -> Q(annIvfCosine, Some(cosineKnnSql(42, 10))),
    "ann_sq8_cosine" -> Q(annSq8Cosine, Some(cosineKnnSql(99, 10))),
    "knn_batch_sq8_cosine" -> Q(knnBatchSq8Cosine, Some(knnBatchCosineSqlFor("11, 12, 13", 5))),
    "ann_graph_cosine" -> Q(annGraphCosine, Some(knnBatchCosineSqlFor("11, 12, 13", 5))),
    "ann_pq_exact" -> Q(annPqExact, Some(knnSql(23, 10))),
    "ann_pq_residual_exact" -> Q(annPqResidualExact, Some(knnSql(29, 10))),
    "save_load_pq_residual" -> Q(saveLoadPqResidual, Some(knnSql(53, 10))),
    "facade_ivfpq_knn" -> Q(facadeIvfpqKnn, Some(knnSql(31, 10))),
    "knn_prefilter_ivfpq" -> Q(knnPrefilterIvfpq,
      Some(knnSql(47, 5, "WHERE e.vec_id % 2 = 0"))),
    "ann_pq" -> Q(annPq, Some(
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |a AS (SELECT vec_id AS aid, emb AS aemb FROM v WHERE vec_id < 16),
        |s AS (SELECT unnest(range(0, 8)) AS s),
        |rd AS (
        |  SELECT v.vec_id AS id, s.s, a.aid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (v.emb[s.s*8 + i] - a.aemb[s.s*8 + i]) * (v.emb[s.s*8 + i] - a.aemb[s.s*8 + i]))) AS d2
        |  FROM v, s, a),
        |codes AS (
        |  SELECT id, s, aid AS code FROM (
        |    SELECT id, s, aid, row_number() OVER (PARTITION BY id, s ORDER BY d2, aid) AS rn FROM rd)
        |  WHERE rn = 1),
        |q AS (SELECT emb AS qe FROM v WHERE vec_id = 7),
        |qd AS (
        |  SELECT s.s, a.aid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (q.qe[s.s*8 + i] - a.aemb[s.s*8 + i]) * (q.qe[s.s*8 + i] - a.aemb[s.s*8 + i]))) AS d2
        |  FROM q, s, a),
        |adc AS (
        |  SELECT c.id, list_sum(list(qd.d2 ORDER BY c.s)) AS dist
        |  FROM codes c JOIN qd ON qd.s = c.s AND qd.aid = c.code
        |  GROUP BY c.id)
        |SELECT id, round(1.0/(1.0 + dist), 4) AS score
        |FROM adc ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "ann_pq_batch" -> Q(annPqBatch, Some(
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |a AS (SELECT vec_id AS aid, emb AS aemb FROM v WHERE vec_id < 16),
        |s AS (SELECT unnest(range(0, 8)) AS s),
        |rd AS (
        |  SELECT v.vec_id AS id, s.s, a.aid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (v.emb[s.s*8 + i] - a.aemb[s.s*8 + i]) * (v.emb[s.s*8 + i] - a.aemb[s.s*8 + i]))) AS d2
        |  FROM v, s, a),
        |codes AS (
        |  SELECT id, s, aid AS code FROM (
        |    SELECT id, s, aid, row_number() OVER (PARTITION BY id, s ORDER BY d2, aid) AS rn FROM rd)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM v WHERE vec_id IN (11, 12)),
        |qd AS (
        |  SELECT q.qid, s.s, a.aid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (q.qe[s.s*8 + i] - a.aemb[s.s*8 + i]) * (q.qe[s.s*8 + i] - a.aemb[s.s*8 + i]))) AS d2
        |  FROM q, s, a),
        |adc AS (
        |  SELECT qd.qid, c.id, list_sum(list(qd.d2 ORDER BY c.s)) AS dist
        |  FROM codes c JOIN qd ON qd.s = c.s AND qd.aid = c.code
        |  GROUP BY qd.qid, c.id)
        |SELECT qid, id, round(1.0/(1.0 + dist), 4) AS score FROM (
        |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
        |  FROM adc)
        |WHERE rn <= 5 ORDER BY qid, score DESC, id""".stripMargin)),
    "ann_lsh" -> Q(annLsh, Some(knnSql(21, 10))),
    "label_centroids" -> Q(labelCentroids, Some(
      """WITH x AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS i,
        |                  unnest(embedding::DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT label, i, round(avg(v), 4) + 0.0 AS avg_v
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "knn_batch" -> Q(knnBatch, Some(knnBatchSql)),
    "knn_batch_topk" -> Q(knnBatchTopk, Some(knnBatchSql)),
    "knn_batch_ivf" -> Q(knnBatchIvf, Some(knnBatchSqlFor("4, 5, 6"))),
    "knn_batch_sq8" -> Q(knnBatchSq8, Some(knnBatchSqlFor("7, 8, 9"))),
    "knn_batch_lsh" -> Q(knnBatchLsh, Some(knnBatchSqlFor("7, 8, 9"))),
    "ann_graph" -> Q(annGraph, Some(knnBatchSqlFor("13, 14, 15"))),
    "ann_graph_sampled" -> Q(annGraphSampled, Some(
      // ann_graph's decade twin (round 16): the exact batch-KNN oracle
      // over the SAME md5-selected four query ids the Spark side picks —
      // sound at any corpus size, which is the point: at sf10-ind this
      // SQL stays linear while the all-queries oracle was the bound
      raw"""WITH sel AS (SELECT vec_id FROM embeddings
           |             ORDER BY md5('agq_' || vec_id), vec_id LIMIT 4),
           |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           |      FROM embeddings WHERE vec_id IN (SELECT vec_id FROM sel)),
           |scored AS (
           |  SELECT q.qid, e.vec_id AS id,
           |         1.0/(1.0 + list_sum(list_transform(range(1, 65),
           |           i -> (e.embedding[i]::DOUBLE - q.qv[i]) * (e.embedding[i]::DOUBLE - q.qv[i])))) AS s
           |  FROM embeddings e, q)
           |SELECT qid, id, round(s, 4) AS score FROM (
           |  SELECT qid, id, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn
           |  FROM scored)
           |WHERE rn <= 5 ORDER BY qid, score DESC, id""".stripMargin)),
    "facade_graph_knn" -> Q(facadeGraphKnn, Some(knnSql(51, 10))),
    "knn_prefilter_graph" -> Q(knnPrefilterGraph,
      Some(knnSql(17, 5, "WHERE e.vec_id % 2 = 0"))),
    "knn_graph" -> Q(knnGraphQ, Some(knnGraphSql)),
    "knn_graph_lsh" -> Q(knnGraphLshQ, Some(knnGraphSql)),
    "graph_pagerank" -> Q(graphPagerank, Some(
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |           WHERE vec_id < 500),
        |scored AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS id,
        |         1.0/(1.0 + list_sum(list_transform(range(1, 65),
        |           i -> (a.emb[i] - b.emb[i]) * (a.emb[i] - b.emb[i])))) AS s
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |e AS (SELECT qid AS src, id AS dst FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn
        |  FROM scored) WHERE rn <= 3),
        |nd AS (SELECT vec_id AS v FROM v),
        |r0 AS (SELECT v, 1.0/500.0 AS r FROM nd),
        |r1 AS (SELECT nd.v, 0.15/500.0 + 0.85*coalesce(c.s, 0.0) AS r FROM nd
        |  LEFT JOIN (SELECT e.dst, list_sum(list_sort(list(r0.r/3.0))) AS s
        |             FROM e JOIN r0 ON e.src = r0.v
        |             GROUP BY e.dst) c ON nd.v = c.dst),
        |r2 AS (SELECT nd.v, 0.15/500.0 + 0.85*coalesce(c.s, 0.0) AS r FROM nd
        |  LEFT JOIN (SELECT e.dst, list_sum(list_sort(list(r1.r/3.0))) AS s
        |             FROM e JOIN r1 ON e.src = r1.v
        |             GROUP BY e.dst) c ON nd.v = c.dst),
        |r3 AS (SELECT nd.v, 0.15/500.0 + 0.85*coalesce(c.s, 0.0) AS r FROM nd
        |  LEFT JOIN (SELECT e.dst, list_sum(list_sort(list(r2.r/3.0))) AS s
        |             FROM e JOIN r2 ON e.src = r2.v
        |             GROUP BY e.dst) c ON nd.v = c.dst)
        |SELECT v AS id, floor(r * 500.0 * 10000.0 + 0.5)/10000.0 AS pr_n
        |FROM r3 ORDER BY id""".stripMargin)),
    "knn_postfilter" -> Q(knnPostFilter, Some(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
         |top AS (
         |  SELECT e.vec_id AS id, e.label,
         |         round(1.0/(1.0 + $sqDistSql), 4) AS score
         |  FROM embeddings e, q
         |  ORDER BY score DESC, id LIMIT 20)
         |SELECT id, score FROM top WHERE label = 3 ORDER BY score DESC, id""".stripMargin)),
    "text_bm25" -> Q(textBm25, Some(
      s"""WITH ${bm25Ctes(bm25Query)}
         |SELECT id, round(score, 4) AS score FROM tscore
         |ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "text_bm25_batch" -> Q(textBm25Batch, Some(bm25BatchSql(bm25BatchQueries, 5))),
    "text_bm25_incremental" -> Q(textBm25Incremental, Some(
      s"""WITH ${bm25Ctes(bm25Query)}
         |SELECT id, round(score, 4) AS score FROM tscore
         |ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "facade_query_text" -> Q(facadeQueryText, Some(
      s"""WITH ${bm25Ctes(bm25Query, joinedCorpus = true)}
         |SELECT id, round(score, 4) AS score FROM tscore
         |ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "meta_head" -> Q(metaHead, Some(
      "SELECT doc_id AS id, lang, source FROM documents ORDER BY id LIMIT 25")),
    "meta_filter" -> Q(metaFilter, Some(
      "SELECT doc_id AS id FROM documents WHERE lang = 'en' AND source = 'src3' ORDER BY id LIMIT 50")),
    "meta_range" -> Q(metaRange, Some(
      "SELECT doc_id AS id FROM documents WHERE n_chars >= 100 AND n_chars < 300 AND lang = 'fr' ORDER BY id")),
    "point_lookup" -> Q(pointLookup, Some(
      "SELECT doc_id AS id, text, lang, source FROM documents WHERE doc_id = 123")),
    "collection_count" -> Q(collectionCount, Some("SELECT count(*) AS n FROM documents")),
    "hybrid_search" -> Q(hybrid, Some(
      // the operator ranks over the tscore ⋈ vscore INNER-join domain (the
      // ids holding both text and vector), so both max-normalizers must be
      // computed over that join — at sf0.1 documents ⊋ embeddings and a
      // full-tscore max would normalize by a score outside the domain
      s"""WITH ${bm25Ctes(bm25Query)},
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
         |vscore AS (
         |  SELECT e.vec_id AS id, 1.0/(1.0 + sqrt($sqDistSql)) AS vs
         |  FROM embeddings e, q),
         |tmax AS (SELECT max(score) AS tm FROM tscore JOIN vscore USING (id)),
         |vmax AS (SELECT max(vs) AS vm FROM vscore JOIN tscore USING (id)),
         |fused AS (
         |  SELECT tscore.id,
         |         0.5 * (CASE WHEN vm > 0 THEN vs / vm ELSE vs END)
         |       + 0.5 * (CASE WHEN tm > 0 THEN tscore.score / tm ELSE tscore.score END) AS raw
         |  FROM tscore JOIN vscore USING (id), tmax, vmax)
         |SELECT id, round(raw, 4) AS score FROM fused WHERE raw > 0
         |ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "hybrid_probe" -> Q(hybridProbe, Some(hybridProbeSql)),
    "streaming_ingest_hybrid" -> Q(streamingIngestHybrid, Some(hybridProbeSql)),
    "hybrid_batch" -> Q(hybridBatchArm(Long.MaxValue), Some(hybridBatchSql(exact = true))),
    "hybrid_batch_probe" -> Q(hybridBatchArm(0L), Some(hybridBatchSql(exact = false))),
    "hybrid_batch_graph" -> Q(hybridBatchGraph, Some(hybridBatchSql(exact = false))),
    "hybrid_batch_filtered" -> Q(hybridBatchFiltered,
      Some(hybridBatchSql(exact = true, restricted = true))),
    "multimodal_features" -> Q(multimodalFeatures, Some(
      """SELECT doc_id AS id, octet_length(text::BLOB)::BIGINT AS n_bytes, md5(text) AS fp,
        |       (octet_length(text::BLOB) % 64 + 1)::INT AS width,
        |       (octet_length(text::BLOB) // 64 + 1)::INT AS height
        |FROM documents ORDER BY id""".stripMargin)),
    "multimodal_frames" -> Q(multimodalFrames, Some(
      """SELECT id, frame_idx, md5(substr(text, frame_idx * 256 + 1, 256)) AS frame_fp
        |FROM (SELECT doc_id AS id, text,
        |        unnest(range(0, (octet_length(text::BLOB) + 255) // 256)) AS frame_idx
        |      FROM documents WHERE doc_id < 50)
        |WHERE frame_idx % 2 = 0 ORDER BY id, frame_idx""".stripMargin)),
    "multimodal_resize" -> Q(multimodalResize, Some(
      """WITH b AS (SELECT doc_id AS id, text, octet_length(text::BLOB) AS len FROM documents),
        |kk AS (SELECT id, text, len, greatest(1, (len + 63) // 64) AS k FROM b),
        |r AS (SELECT id, (len + k - 1) // k AS n,
        |      array_to_string(list_transform(range(0, (len + k - 1) // k),
        |        i -> substr(text, CAST(1 + i*k AS INT), 1)), '') AS s FROM kk)
        |SELECT id, 8 AS out_w, 8 AS out_h, CAST(n AS INT) AS n_sampled, md5(s) AS resized_fp
        |FROM r ORDER BY id""".stripMargin)),
    "multimodal_binary_resize" -> Q(multimodalBinaryResize, Some(
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         array_to_string(list_transform(range(0, 40), i -> md5(text || '_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |b AS (SELECT id, hx, length(hx) // 2 AS len FROM p),
        |kk AS (SELECT id, hx, len, greatest(1, (len + 63) // 64) AS k FROM b),
        |r AS (SELECT id, (len + k - 1) // k AS n,
        |        array_to_string(list_transform(range(0, (len + k - 1) // k),
        |          j -> substr(hx, CAST(j*k*2 + 1 AS INT), 2)), '') AS s
        |      FROM kk)
        |SELECT id, 8 AS out_w, 8 AS out_h, CAST(n AS INT) AS n_sampled, md5(s) AS resized_fp
        |FROM r ORDER BY id""".stripMargin)),
    "multimodal_binary_frames" -> Q(multimodalBinaryFrames, Some(
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         array_to_string(list_transform(range(0, 40), i -> md5(text || '_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |b AS (SELECT id, hx, length(hx) // 2 AS len FROM p),
        |f AS (SELECT id, hx, unnest(range(0, (len + 255) // 256)) AS frame_idx FROM b)
        |SELECT id, CAST(frame_idx AS INT) AS frame_idx,
        |       md5(substr(hx, CAST(frame_idx*512 + 1 AS INT), 512)) AS frame_fp
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY id, frame_idx""".stripMargin)),
    "multimodal_mp3_parse" -> Q(multimodalMp3Parse, Some(
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         (2 + doc_id % 2)::INT AS n_frames,
        |         (32 + 8 * (doc_id % 3))::INT AS bitrate_kbps,
        |         (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)::INT AS sample_rate,
        |         array_to_string(list_transform(range(0, 40), i -> md5(text || '_mp3_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |f AS (SELECT *, (144 * bitrate_kbps * 1000) // sample_rate AS flen FROM p)
        |SELECT id, n_frames, bitrate_kbps, sample_rate,
        |       (n_frames * 1152 * 1000) // sample_rate AS duration_ms,
        |       md5(substr(hx, 1, n_frames * (flen - 4) * 2)) AS payload_fp
        |FROM f ORDER BY id""".stripMargin)),
    "multimodal_mp3_sideinfo" -> Q(multimodalMp3Sideinfo, Some(
      // restates mp3SideinfoAssets' field formulas per (id, granule,
      // channel): every side-info field + the scale-factor sum (granule 1
      // honoring the scfsi share pattern), so the bit-exact parse of the
      // hand-assembled frames is pinned end to end
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
        |g AS (SELECT unnest(range(0, 2)) AS granule),
        |c AS (SELECT unnest(range(0, 2)) AS channel)
        |SELECT id, granule::INT AS granule, channel::INT AS channel,
        |  0 AS main_data_begin,
        |  id % 8 AS private_bits,
        |  8*((id+channel)%2) + 4*((id+channel+1)%2) + 2*((id+channel+2)%2) + ((id+channel+3)%2) AS scfsi,
        |  CASE WHEN granule = 0 THEN 42
        |       ELSE 42 - 2*(6*((id+channel)%2) + 5*((id+channel+1)%2)
        |                   + 5*((id+channel+2)%2) + 5*((id+channel+3)%2)) END AS part23_length,
        |  (7*id + 13*granule + 3*channel) % 289 AS big_values,
        |  (5*id + 17*granule + 29*channel) % 256 AS global_gain,
        |  9 AS scalefac_compress,
        |  0 AS block_type,
        |  ((id+granule+channel)%32)*1024 + ((2*id+granule)%32)*32 + ((id+5*channel)%32) AS table_select,
        |  id % 16 AS region0,
        |  (id+granule) % 8 AS region1,
        |  id % 2 AS preflag,
        |  (id+granule) % 2 AS scalefac_scale,
        |  (id+channel) % 2 AS count1table,
        |  (CASE WHEN granule = 0 THEN list_sum(list_transform(range(0,21), b -> (id+b)%4))
        |        ELSE list_sum(list_transform(range(0,21), b ->
        |          CASE WHEN (id + channel + (CASE WHEN b<6 THEN 0 WHEN b<11 THEN 1 WHEN b<16 THEN 2 ELSE 3 END)) % 2 = 1
        |               THEN (id+b)%4 ELSE (id+b+1)%4 END)) END)::BIGINT AS sf_sum,
        |  21 AS sf_n
        |FROM ids, g, c
        |ORDER BY id, granule, channel""".stripMargin)),
    "multimodal_mp3_huffman" -> Q(multimodalMp3Huffman, Some(
      // restates mp3HuffmanAssets' spectral-value formulas per (id,
      // granule, channel): the decoded signed integers of both Huffman
      // regions (fixture small + escape codebooks) and the count1 run,
      // aggregated as counts, exact sums, and the position-weighted
      // checksum Σ (i+1)·is(i) — so pair/quad decode, linbits escapes,
      // sign bits AND sample placement are all oracle-checked. The
      // values are (g, ch)-independent by construction; the four rows
      // differ only in how they were ENCODED (count1 table A/B parity),
      // which is exactly what the shared restatement pins.
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
        |g AS (SELECT unnest(range(0, 2)) AS granule),
        |c AS (SELECT unnest(range(0, 2)) AS channel),
        |base AS (
        |  SELECT id, granule::INT AS granule, channel::INT AS channel,
        |         2*(20 + id%5) AS n_big, 4*(4 + id%3) AS n_c1
        |  FROM ids, g, c),
        |vals AS (
        |  SELECT id, granule, channel, n_big, n_c1,
        |    list_transform(range(0, n_big + n_c1), i ->
        |      (CASE WHEN (id+i)%5 < 2 THEN -1 ELSE 1 END) *
        |      (CASE WHEN i < 16 THEN (id+i)%4
        |            WHEN i < n_big THEN
        |              CASE (id+i)%4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1
        |                   ELSE 15 + (id+i)%8 END
        |            ELSE (id+i)%2 END)) AS v
        |  FROM base)
        |SELECT id, granule, channel,
        |  n_big::INT AS n_big, n_c1::INT AS n_count1,
        |  len(list_filter(v, x -> x <> 0))::INT AS n_nonzero,
        |  list_sum(v)::BIGINT AS is_sum,
        |  list_sum(list_transform(v, x -> abs(x)))::BIGINT AS is_abs_sum,
        |  list_sum(list_transform(range(0, n_big + n_c1), i -> v[i+1] * (i+1)))::BIGINT AS pos_sum
        |FROM vals ORDER BY id, granule, channel""".stripMargin)),
    "multimodal_mp3_reservoir" -> Q(multimodalMp3Reservoir, Some(
      // the huffman oracle's value formulas evaluated at k = id + 7·frame
      // over a 3-frame RESERVOIR stream: every decoded integer of frames
      // whose granule data lives in earlier frames' slot regions
      // (main_data_begin > 0, asserted at fixture build) must land at
      // the same checksums as a self-contained decode of the same values
      // — the pointer walk is pinned because a misplaced start scrambles
      // pos_sum
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 24),
        |f AS (SELECT unnest(range(0, 3)) AS frame),
        |g AS (SELECT unnest(range(0, 2)) AS granule),
        |c AS (SELECT unnest(range(0, 2)) AS channel),
        |base AS (
        |  SELECT id, frame::INT AS frame, granule::INT AS granule,
        |         channel::INT AS channel, id + 7*frame AS k,
        |         2*(20 + (id + 7*frame)%5) AS n_big,
        |         4*(4 + (id + 7*frame)%3) AS n_c1
        |  FROM ids, f, g, c),
        |vals AS (
        |  SELECT id, frame, granule, channel, n_big, n_c1,
        |    list_transform(range(0, n_big + n_c1), i ->
        |      (CASE WHEN (k+i)%5 < 2 THEN -1 ELSE 1 END) *
        |      (CASE WHEN i < 16 THEN (k+i)%4
        |            WHEN i < n_big THEN
        |              CASE (k+i)%4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1
        |                   ELSE 15 + (k+i)%8 END
        |            ELSE (k+i)%2 END)) AS v
        |  FROM base)
        |SELECT id, frame, granule, channel,
        |  n_big::INT AS n_big, n_c1::INT AS n_count1,
        |  len(list_filter(v, x -> x <> 0))::INT AS n_nonzero,
        |  list_sum(v)::BIGINT AS is_sum,
        |  list_sum(list_transform(v, x -> abs(x)))::BIGINT AS is_abs_sum,
        |  list_sum(list_transform(range(0, n_big + n_c1), i -> v[i+1] * (i+1)))::BIGINT AS pos_sum
        |FROM vals ORDER BY id, frame, granule, channel""".stripMargin)),
    "multimodal_mp3_pcm" -> Q(multimodalMp3Pcm, Some(
      // restates mp3PcmAssets' spectra THROUGH THE ENTIRE §2.4.3.4 DSP
      // chain in SQL: requantization (power law + scalefactor/pretab
      // exponents over the B.8 band map), MS stereo for odd ids, the 31
      // boundary alias butterflies, the 36-point IMDCT with the long
      // sine window, overlap-add across the two granules, frequency
      // inversion, the 64x32 synthesis matrixing and the 16-slot
      // windowed FIFO read-out (formula fixture window), then the
      // floor-based 16-bit quantizer. Every float op mirrors the Scala
      // loop order (left-to-right list_sum folds), so the only
      // cross-engine divergence is ~1-ulp libm cos/pow noise — absorbed
      // by the integer quantization the aggregates are computed over.
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 8),
        |gs AS (SELECT unnest(range(0, 2)) AS g),
        |chs AS (SELECT unnest(range(0, 2)) AS ch),
        |const AS (SELECT
        |  [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576] AS bands,
        |  [0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0] AS pretab,
        |  [-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,-0.0142,-0.0037] AS ci),
        |base AS (
        |  SELECT id, g, ch, 2*(20 + id%5) AS n_big, 4*(4 + id%3) AS n_c1,
        |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
        |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult,
        |         id % 2 AS preflag
        |  FROM ids, gs, chs),
        |spec AS (
        |  SELECT id, g, ch, gg, mult, preflag,
        |    list_transform(range(0, 576), i ->
        |      CASE WHEN i >= n_big + n_c1 THEN 0 ELSE
        |        (CASE WHEN (id+i)%5 < 2 THEN -1 ELSE 1 END) *
        |        (CASE WHEN i < 16 THEN (id+i)%4
        |              WHEN i < n_big THEN
        |                CASE (id+i)%4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1
        |                     ELSE 15 + (id+i)%8 END
        |              ELSE (id+i)%2 END)
        |      END) AS isv
        |  FROM base),
        |xr AS (
        |  SELECT s.id, s.g, s.ch,
        |    list_transform(range(0, 576), i ->
        |      CASE WHEN s.isv[i+1] = 0 THEN 0.0 ELSE
        |        sign(s.isv[i+1]) * pow(abs(s.isv[i+1]), 4.0/3.0) *
        |        pow(2.0, 0.25*(s.gg - 210) - s.mult * (
        |          (CASE WHEN len(list_filter(c.bands, x -> x <= i)) - 1 >= 21 THEN 0
        |                ELSE (s.id + (len(list_filter(c.bands, x -> x <= i)) - 1)) % 4 END)
        |          + s.preflag * c.pretab[len(list_filter(c.bands, x -> x <= i))]))
        |      END) AS v
        |  FROM spec s, const c),
        |msx AS (
        |  SELECT a.id, a.g, 0 AS ch,
        |    CASE WHEN a.id % 2 = 1
        |         THEN list_transform(range(0, 576), i -> (a.v[i+1] + b.v[i+1]) / sqrt(2.0))
        |         ELSE a.v END AS v
        |  FROM xr a JOIN xr b ON a.id = b.id AND a.g = b.g
        |  WHERE a.ch = 0 AND b.ch = 1
        |  UNION ALL
        |  SELECT a.id, a.g, 1 AS ch,
        |    CASE WHEN a.id % 2 = 1
        |         THEN list_transform(range(0, 576), i -> (a.v[i+1] - b.v[i+1]) / sqrt(2.0))
        |         ELSE b.v END AS v
        |  FROM xr a JOIN xr b ON a.id = b.id AND a.g = b.g
        |  WHERE a.ch = 0 AND b.ch = 1),
        |al AS (
        |  SELECT m.id, m.g, m.ch,
        |    list_transform(range(0, 576), i -> CASE
        |      WHEN i % 18 >= 10 AND i < 558 THEN
        |        m.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
        |        m.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
        |      WHEN i % 18 <= 7 AND i >= 18 THEN
        |        m.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
        |        m.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
        |      ELSE m.v[i+1] END) AS v
        |  FROM msx m, const c),
        |im AS (
        |  SELECT a.id, a.ch, a.g, sb.sb,
        |    list_transform(range(0, 36), i ->
        |      list_sum(list_transform(range(0, 18), k ->
        |        a.v[18*sb.sb + k + 1] * cos(pi()/72 * (2*i + 19) * (2*k + 1))))
        |      * sin(pi()/36 * (i + 0.5))) AS z
        |  FROM al a, (SELECT unnest(range(0, 32)) AS sb) sb),
        |ts AS (
        |  SELECT z0.id, z0.ch, z0.sb,
        |    list_transform(range(0, 36), t -> (
        |      CASE WHEN t < 18 THEN z0.z[t+1]
        |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
        |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
        |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
        |  WHERE z0.g = 0 AND z1.g = 1),
        |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
        |vmat AS (
        |  SELECT id, ch,
        |    list_transform(range(0, 36), t ->
        |      list_transform(range(0, 64), o ->
        |        list_sum(list_transform(range(0, 32), k ->
        |          cos((16 + o) * (2*k + 1) * pi()/64) * m[k+1][t+1])))) AS vm
        |  FROM mat),
        |pcm AS (
        |  SELECT id, ch,
        |    list_transform(range(0, 1152), p ->
        |      CAST(greatest(-32768.0, least(32767.0, floor(
        |        list_sum(list_transform(range(0, 16), n ->
        |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
        |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
        |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
        |        * 32768.0 + 0.5))) AS INT)) AS q
        |  FROM vmat)
        |SELECT id, ch::INT AS channel, (id % 2)::INT AS ms_stereo,
        |  1152::INT AS n_samples,
        |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
        |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
        |  list_sum(q)::BIGINT AS pcm_sum,
        |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
        |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
        |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_intensity" -> Q(multimodalMp3Intensity, Some(
      // restates mp3IntensityAssets' JOINT-STEREO chain (round 15 —
      // §2.7(a) closed): per-channel requantization, then the
      // §2.4.3.4.9.3 stereo stage — the right channel's zero part
      // starts at sample 16 (= band 4), the raw right scalefactor is
      // the intensity position in bands 4..21 (band 21 reuses 20's):
      // 7 = off (MS applies there for odd ids), 6 = all-left,
      // else L' = L·t/(1+t), R' = L/(1+t) with t = tan(pos·π/12) —
      // followed by the full alias/IMDCT/overlap/synthesis tail and
      // the floor-form quantizer; integer aggregates absorb the
      // ~1-ulp tan/cos/pow noise like every PCM gate
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 8),
        |gs AS (SELECT unnest(range(0, 2)) AS g),
        |chs AS (SELECT unnest(range(0, 2)) AS ch),
        |const AS (SELECT
        |  [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576] AS bands,
        |  [-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,-0.0142,-0.0037] AS ci),
        |base AS (
        |  SELECT id, g, ch, CASE WHEN ch = 0 THEN 48 ELSE 16 END AS n_big,
        |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
        |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult
        |  FROM ids, gs, chs),
        |spec AS (
        |  SELECT id, g, ch, gg, mult,
        |    list_transform(range(0, 576), i ->
        |      CASE WHEN i >= n_big THEN 0 ELSE
        |        (CASE WHEN (id+i+ch)%5 < 2 THEN -1 ELSE 1 END) * ((id+i+ch)%3)
        |      END) AS isv
        |  FROM base),
        |xr AS (
        |  SELECT s.id, s.g, s.ch,
        |    list_transform(range(0, 576), i ->
        |      CASE WHEN s.isv[i+1] = 0 THEN 0.0 ELSE
        |        sign(s.isv[i+1]) * pow(abs(s.isv[i+1]), 4.0/3.0) *
        |        pow(2.0, 0.25*(s.gg - 210) - s.mult * (
        |          CASE WHEN s.ch = 0
        |               THEN (s.id + 2*(len(list_filter(c.bands, x -> x <= i)) - 1) + s.g) % 4
        |               ELSE (s.id + (len(list_filter(c.bands, x -> x <= i)) - 1) + s.g) % 4 END))
        |      END) AS v
        |  FROM spec s, const c),
        |posl AS (
        |  SELECT i.id, g.g,
        |    list_transform(range(0, 576), k ->
        |      CASE WHEN k < 16 THEN -1 ELSE
        |        CAST((i.id + least(len(list_filter(c.bands, x -> x <= k)) - 1, 20) + g.g) % 8 AS INT)
        |      END) AS p
        |  FROM ids i, gs g, const c),
        |ims AS (
        |  SELECT a.id, a.g, 0 AS ch,
        |    list_transform(range(0, 576), i -> CASE
        |      WHEN pl.p[i+1] = -1 OR pl.p[i+1] = 7 THEN
        |        CASE WHEN a.id % 2 = 1 THEN (a.v[i+1] + b.v[i+1]) / sqrt(2.0) ELSE a.v[i+1] END
        |      WHEN pl.p[i+1] = 6 THEN a.v[i+1]
        |      ELSE a.v[i+1] * (tan(pl.p[i+1] * pi() / 12.0) / (1.0 + tan(pl.p[i+1] * pi() / 12.0)))
        |      END) AS v
        |  FROM xr a JOIN xr b ON a.id = b.id AND a.g = b.g
        |  JOIN posl pl ON pl.id = a.id AND pl.g = a.g
        |  WHERE a.ch = 0 AND b.ch = 1
        |  UNION ALL
        |  SELECT a.id, a.g, 1 AS ch,
        |    list_transform(range(0, 576), i -> CASE
        |      WHEN pl.p[i+1] = -1 OR pl.p[i+1] = 7 THEN
        |        CASE WHEN a.id % 2 = 1 THEN (a.v[i+1] - b.v[i+1]) / sqrt(2.0) ELSE b.v[i+1] END
        |      WHEN pl.p[i+1] = 6 THEN 0.0
        |      ELSE a.v[i+1] * (1.0 / (1.0 + tan(pl.p[i+1] * pi() / 12.0)))
        |      END) AS v
        |  FROM xr a JOIN xr b ON a.id = b.id AND a.g = b.g
        |  JOIN posl pl ON pl.id = a.id AND pl.g = a.g
        |  WHERE a.ch = 0 AND b.ch = 1),
        |al AS (
        |  SELECT m.id, m.g, m.ch,
        |    list_transform(range(0, 576), i -> CASE
        |      WHEN i % 18 >= 10 AND i < 558 THEN
        |        m.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
        |        m.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
        |      WHEN i % 18 <= 7 AND i >= 18 THEN
        |        m.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
        |        m.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
        |      ELSE m.v[i+1] END) AS v
        |  FROM ims m, const c),
        |im AS (
        |  SELECT a.id, a.ch, a.g, sb.sb,
        |    list_transform(range(0, 36), i ->
        |      list_sum(list_transform(range(0, 18), k ->
        |        a.v[18*sb.sb + k + 1] * cos(pi()/72 * (2*i + 19) * (2*k + 1))))
        |      * sin(pi()/36 * (i + 0.5))) AS z
        |  FROM al a, (SELECT unnest(range(0, 32)) AS sb) sb),
        |ts AS (
        |  SELECT z0.id, z0.ch, z0.sb,
        |    list_transform(range(0, 36), t -> (
        |      CASE WHEN t < 18 THEN z0.z[t+1]
        |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
        |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
        |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
        |  WHERE z0.g = 0 AND z1.g = 1),
        |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
        |vmat AS (
        |  SELECT id, ch,
        |    list_transform(range(0, 36), t ->
        |      list_transform(range(0, 64), o ->
        |        list_sum(list_transform(range(0, 32), k ->
        |          cos((16 + o) * (2*k + 1) * pi()/64) * m[k+1][t+1])))) AS vm
        |  FROM mat),
        |pcm AS (
        |  SELECT id, ch,
        |    list_transform(range(0, 1152), p ->
        |      CAST(greatest(-32768.0, least(32767.0, floor(
        |        list_sum(list_transform(range(0, 16), n ->
        |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
        |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
        |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
        |        * 32768.0 + 0.5))) AS INT)) AS q
        |  FROM vmat)
        |SELECT id, ch::INT AS channel, (id % 2)::INT AS ms_stereo,
        |  1152::INT AS n_samples,
        |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
        |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
        |  list_sum(q)::BIGINT AS pcm_sum,
        |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
        |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
        |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_intensity_short" -> Q(multimodalMp3IntensityShort, Some(
      // restates mp3IntensityShortAssets' chain (late round 15 — the
      // DECIDED band-granular short-intensity rule): per-window
      // subblock-gain requant through the §2.4.3.4.8 reorder, the
      // intensity region = short bands with 3·bS(s) ≥ 12 (the right
      // channel's zero part), per-(band, window) positions with band
      // 12 reusing 11's, MS elsewhere for odd ids, then the pure-short
      // DSP tail (NO alias stage, three 12-point IMDCTs per subband,
      // overlap/inversion/synthesis) and the floor-form quantizer
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |gs AS (SELECT unnest(range(0, 2)) AS g),
           |chs AS (SELECT unnest(range(0, 2)) AS ch),
           |const AS (SELECT
           |  [0,4,8,12,16,22,30,40,52,66,84,106,136,192] AS bs),
           |base AS (
           |  SELECT id, g, ch, CASE WHEN ch = 0 THEN 48 ELSE 12 END AS n,
           |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
           |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult
           |  FROM ids, gs, chs),
           |spec AS (
           |  SELECT id, g, ch, gg, mult,
           |    list_transform(range(0, 576), i ->
           |      CASE WHEN i >= n THEN 0 ELSE
           |        (CASE WHEN (id+i+ch+g)%5 < 2 THEN -1 ELSE 1 END) * ((id+i+ch+7*g)%3)
           |      END) AS isv
           |  FROM base),
           |smap AS (
           |  SELECT m.t, m.j, m.w,
           |         len(list_filter(c.bs, x -> x <= m.j)) - 1 AS s,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS lo,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j)) + 1]
           |           - c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS width
           |  FROM (SELECT t, 6*(t//18) + (t%6) AS j, (t%18)//6 AS w
           |        FROM (SELECT unnest(range(0, 576)) AS t)) m, const c),
           |xrow AS (
           |  SELECT sp.id, sp.g, sp.ch, m.t,
           |    CASE WHEN sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1] = 0 THEN 0.0 ELSE
           |      sign(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]) *
           |      pow(abs(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]), 4.0/3.0) *
           |      pow(2.0, 0.25*(sp.gg - 210 - 8*((sp.id + 2*m.w + sp.g + sp.ch) % 4)) -
           |        sp.mult * (CASE WHEN sp.ch = 1 AND m.s = 0
           |                        THEN (sp.id + m.s + m.w + sp.g) % 4 ELSE 0 END))
           |    END AS v
           |  FROM spec sp, smap m),
           |xrl AS (SELECT id, g, ch, list(v ORDER BY t) AS v FROM xrow GROUP BY id, g, ch),
           |ims AS (
           |  SELECT a.id, a.g, 0 AS ch,
           |    list_transform(range(0, 576), t -> CASE
           |      WHEN NOT (3 * c.bs[len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6)))] >= 12)
           |        OR (a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |            + (t%18)//6 + a.g) % 8 = 7
           |      THEN CASE WHEN a.id % 2 = 1 THEN (a.v[t+1] + b.v[t+1]) / sqrt(2.0) ELSE a.v[t+1] END
           |      WHEN (a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |            + (t%18)//6 + a.g) % 8 = 6
           |      THEN a.v[t+1]
           |      ELSE a.v[t+1] * (tan(((a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |                             + (t%18)//6 + a.g) % 8) * pi() / 12.0)
           |                       / (1.0 + tan(((a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |                             + (t%18)//6 + a.g) % 8) * pi() / 12.0)))
           |      END) AS v
           |  FROM xrl a JOIN xrl b ON a.id = b.id AND a.g = b.g, const c
           |  WHERE a.ch = 0 AND b.ch = 1
           |  UNION ALL
           |  SELECT a.id, a.g, 1 AS ch,
           |    list_transform(range(0, 576), t -> CASE
           |      WHEN NOT (3 * c.bs[len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6)))] >= 12)
           |        OR (a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |            + (t%18)//6 + a.g) % 8 = 7
           |      THEN CASE WHEN a.id % 2 = 1 THEN (a.v[t+1] - b.v[t+1]) / sqrt(2.0) ELSE b.v[t+1] END
           |      WHEN (a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |            + (t%18)//6 + a.g) % 8 = 6
           |      THEN 0.0
           |      ELSE a.v[t+1] * (1.0 / (1.0 + tan(((a.id + least(len(list_filter(c.bs, x -> x <= 6*(t//18) + (t%6))) - 1, 11)
           |                             + (t%18)//6 + a.g) % 8) * pi() / 12.0)))
           |      END) AS v
           |  FROM xrl a JOIN xrl b ON a.id = b.id AND a.g = b.g, const c
           |  WHERE a.ch = 0 AND b.ch = 1),
           |im AS (
           |  SELECT a.id, a.ch, a.g, sb.sb,
           |    list_transform(range(0, 36), i ->
           |      list_sum(list_transform(range(0, 3), w ->
           |        CASE WHEN i - 6 - 6*w >= 0 AND i - 6 - 6*w < 12 THEN
           |          list_sum(list_transform(range(0, 6), kk ->
           |            a.v[18*sb.sb + 6*w + kk + 1] * cos(pi()/24 * (2*(i - 6 - 6*w) + 7) * (2*kk + 1))))
           |          * sin(pi()/12 * ((i - 6 - 6*w) + 0.5))
           |        ELSE 0.0 END))) AS z
           |  FROM ims a, (SELECT unnest(range(0, 32)) AS sb) sb),
           |ts AS (
           |  SELECT z0.id, z0.ch, z0.sb,
           |    list_transform(range(0, 36), t -> (
           |      CASE WHEN t < 18 THEN z0.z[t+1]
           |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
           |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
           |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
           |  WHERE z0.g = 0 AND z1.g = 1),
           |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
           |vmat AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 36), t ->
           |      list_transform(range(0, 64), o ->
           |        list_sum(list_transform(range(0, 32), k ->
           |          cos((16 + o) * (2*k + 1) * pi()/64) * m[k+1][t+1])))) AS vm
           |  FROM mat),
           |pcm AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 1152), p ->
           |      CAST(greatest(-32768.0, least(32767.0, floor(
           |        list_sum(list_transform(range(0, 16), n ->
           |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
           |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
           |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
           |        * 32768.0 + 0.5))) AS INT)) AS q
           |  FROM vmat)
           |SELECT id, ch::INT AS channel, (id % 2)::INT AS ms_stereo,
           |  1152::INT AS n_samples,
           |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
           |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
           |  list_sum(q)::BIGINT AS pcm_sum,
           |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
           |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
           |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_intensity_mixed" -> Q(multimodalMp3IntensityMixed, Some(
      // restates mp3IntensityMixedAssets' chain (round 16 — the
      // long+short band SEAM, the last §2.7(a) refusal): mixed requant
      // (long in place below sample 36, the §2.4.3.4.8 short reorder
      // with subblock gains above), then the seam rule — even ids'
      // zero part starts at sample 18 so long bands 5..7 (from the
      // first-boundary-≥-rzero rule) plus EVERY short band are
      // intensity; odd ids' zero part starts at 42 so no long band
      // and short bands s ≥ 4 only (band 3 straddles → normal/MS) —
      // per-(band, window) positions, band 12 reusing 11's, MS on odd
      // ids where is_pos = 7 or outside the region; then the mixed DSP
      // tail (ONE alias boundary, type-0 long windows on subbands 0–1,
      // short 12-point IMDCTs above, overlap/inversion/synthesis) and
      // the floor-form quantizer — integer aggregates absorbing libm ulp
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |gs AS (SELECT unnest(range(0, 2)) AS g),
           |chs AS (SELECT unnest(range(0, 2)) AS ch),
           |const AS (SELECT
           |  [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576] AS bands,
           |  [0,4,8,12,16,22,30,40,52,66,84,106,136,192] AS bs,
           |  [-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,-0.0142,-0.0037] AS ci),
           |base AS (
           |  SELECT id, g, ch,
           |         CASE WHEN ch = 0 THEN 48 WHEN id % 2 = 0 THEN 18 ELSE 42 END AS n,
           |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
           |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult
           |  FROM ids, gs, chs),
           |spec AS (
           |  SELECT id, g, ch, gg, mult,
           |    list_transform(range(0, 576), i ->
           |      CASE WHEN i >= n THEN 0 ELSE
           |        (CASE WHEN (id+i+ch+g)%5 < 2 THEN -1 ELSE 1 END) * ((id+i+ch+7*g)%3)
           |      END) AS isv
           |  FROM base),
           |smap AS (
           |  SELECT m.t, m.j, m.w,
           |         least(len(list_filter(c.bs, x -> x <= m.j)) - 1, 12) AS s,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS lo,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j)) + 1]
           |           - c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS width,
           |         least(len(list_filter(c.bands, x -> x <= m.t)) - 1, 7) AS lb
           |  FROM (SELECT t, 6*(t//18) + (t%6) AS j, (t%18)//6 AS w
           |        FROM (SELECT unnest(range(0, 576)) AS t)) m, const c),
           |xrow AS (
           |  SELECT sp.id, sp.g, sp.ch, m.t,
           |    CASE WHEN m.t < 36 THEN
           |      CASE WHEN sp.isv[m.t+1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[m.t+1]) * pow(abs(sp.isv[m.t+1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210) - sp.mult * (
           |          CASE WHEN sp.ch = 0 THEN (sp.id + 2*m.lb + sp.g) % 4
           |               WHEN sp.id % 2 = 0 AND m.lb >= 5 THEN (sp.id + m.lb + sp.g) % 8
           |               ELSE (sp.id + m.lb + sp.g) % 4 END))
           |      END
           |    ELSE
           |      CASE WHEN sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]) *
           |        pow(abs(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210 - 8*((sp.id + 2*m.w + sp.g + sp.ch) % 4)) -
           |          sp.mult * (CASE WHEN m.s >= 12 THEN 0
           |                          WHEN sp.ch = 0 THEN (sp.id + m.s + 2*m.w + sp.g) % 4
           |                          WHEN sp.id % 2 = 0 OR m.s >= 4 THEN (sp.id + m.s + m.w + sp.g) % 8
           |                          ELSE (sp.id + m.s + m.w + sp.g) % 4 END))
           |      END
           |    END AS v
           |  FROM spec sp, smap m),
           |xrl AS (SELECT id, g, ch, list(v ORDER BY t) AS v FROM xrow GROUP BY id, g, ch),
           |tl AS (SELECT list(lb ORDER BY t) AS lbl, list(least(s, 11) ORDER BY t) AS sbl,
           |              list(w ORDER BY t) AS wl,
           |              list(CASE WHEN 3 * bs[s + 1] >= 42 THEN 1 ELSE 0 END ORDER BY t) AS dpl
           |       FROM smap, const),
           |posr AS (
           |  SELECT i.id, g.g,
           |    list_transform(range(0, 576), tt -> CASE WHEN tt < 36
           |        THEN (i.id + t.lbl[tt+1] + g.g) % 8
           |        ELSE (i.id + t.sbl[tt+1] + t.wl[tt+1] + g.g) % 8 END) AS pos,
           |    list_transform(range(0, 576), tt -> CASE WHEN tt < 36
           |        THEN CASE WHEN i.id % 2 = 0 AND tt >= 20 THEN 1 ELSE 0 END
           |        ELSE CASE WHEN i.id % 2 = 0 OR t.dpl[tt+1] = 1 THEN 1 ELSE 0 END END) AS inr
           |  FROM ids i, gs g, tl t),
           |ims AS (
           |  SELECT a.id, a.g, 0 AS ch,
           |    list_transform(range(0, 576), tt -> CASE
           |      WHEN p.inr[tt+1] = 0 OR p.pos[tt+1] = 7
           |        THEN CASE WHEN a.id % 2 = 1 THEN (a.v[tt+1] + b.v[tt+1]) / sqrt(2.0) ELSE a.v[tt+1] END
           |      WHEN p.pos[tt+1] = 6 THEN a.v[tt+1]
           |      ELSE a.v[tt+1] * (tan(p.pos[tt+1] * pi() / 12.0) / (1.0 + tan(p.pos[tt+1] * pi() / 12.0)))
           |      END) AS v
           |  FROM xrl a JOIN xrl b ON a.id = b.id AND a.g = b.g
           |  JOIN posr p ON p.id = a.id AND p.g = a.g
           |  WHERE a.ch = 0 AND b.ch = 1
           |  UNION ALL
           |  SELECT a.id, a.g, 1 AS ch,
           |    list_transform(range(0, 576), tt -> CASE
           |      WHEN p.inr[tt+1] = 0 OR p.pos[tt+1] = 7
           |        THEN CASE WHEN a.id % 2 = 1 THEN (a.v[tt+1] - b.v[tt+1]) / sqrt(2.0) ELSE b.v[tt+1] END
           |      WHEN p.pos[tt+1] = 6 THEN 0.0
           |      ELSE a.v[tt+1] * (1.0 / (1.0 + tan(p.pos[tt+1] * pi() / 12.0)))
           |      END) AS v
           |  FROM xrl a JOIN xrl b ON a.id = b.id AND a.g = b.g
           |  JOIN posr p ON p.id = a.id AND p.g = a.g
           |  WHERE a.ch = 0 AND b.ch = 1),
           |al AS (
           |  SELECT x.id, x.g, x.ch,
           |    list_transform(range(0, 576), i -> CASE
           |      WHEN i % 18 >= 10 AND i < 18 THEN
           |        x.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
           |        x.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
           |      WHEN i % 18 <= 7 AND i >= 18 AND i < 36 THEN
           |        x.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
           |        x.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
           |      ELSE x.v[i+1] END) AS v
           |  FROM ims x, const c),
           |im AS (
           |  SELECT a.id, a.ch, a.g, sb.sb,
           |    CASE WHEN sb.sb < 2 THEN
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 18), kk ->
           |          a.v[18*sb.sb + kk + 1] * cos(pi()/72 * (2*i + 19) * (2*kk + 1))))
           |        * sin(pi()/36 * (i + 0.5)))
           |    ELSE
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 3), w ->
           |          CASE WHEN i - 6 - 6*w >= 0 AND i - 6 - 6*w < 12 THEN
           |            list_sum(list_transform(range(0, 6), kk ->
           |              a.v[18*sb.sb + 6*w + kk + 1] * cos(pi()/24 * (2*(i - 6 - 6*w) + 7) * (2*kk + 1))))
           |            * sin(pi()/12 * ((i - 6 - 6*w) + 0.5))
           |          ELSE 0.0 END)))
           |    END AS z
           |  FROM al a, (SELECT unnest(range(0, 32)) AS sb) sb),
           |ts AS (
           |  SELECT z0.id, z0.ch, z0.sb,
           |    list_transform(range(0, 36), t -> (
           |      CASE WHEN t < 18 THEN z0.z[t+1]
           |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
           |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
           |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
           |  WHERE z0.g = 0 AND z1.g = 1),
           |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
           |vmat AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 36), t ->
           |      list_transform(range(0, 64), o ->
           |        list_sum(list_transform(range(0, 32), kk ->
           |          cos((16 + o) * (2*kk + 1) * pi()/64) * m[kk+1][t+1])))) AS vm
           |  FROM mat),
           |pcm AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 1152), p ->
           |      CAST(greatest(-32768.0, least(32767.0, floor(
           |        list_sum(list_transform(range(0, 16), n ->
           |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
           |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
           |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
           |        * 32768.0 + 0.5))) AS INT)) AS q
           |  FROM vmat)
           |SELECT id, ch::INT AS channel, (id % 2)::INT AS ms_stereo,
           |  1152::INT AS n_samples,
           |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
           |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
           |  list_sum(q)::BIGINT AS pcm_sum,
           |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
           |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
           |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_short" -> Q(multimodalMp3Short, Some(
      // restates mp3ShortAssets' WINDOW-SWITCHED chain in SQL (round
      // 15, r14 VERDICT #2): granule 0 block_type 1 (start window, long
      // requant incl. pretab, full alias reduction), granule 1 PURE
      // SHORT (per-window subblock-gain requant, the §2.4.3.4.8
      // t = 18·(j/6)+6w+(j%6) reorder, NO alias stage, three 12-point
      // IMDCTs overlapped per subband), then the shared overlap-add /
      // frequency-inversion / synthesis / floor-quantizer tail — every
      // float op in the Scala loop order, integer aggregates absorbing
      // the ~1-ulp libm noise exactly like multimodal_mp3_pcm
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |gs AS (SELECT unnest(range(0, 2)) AS g),
           |chs AS (SELECT unnest(range(0, 2)) AS ch),
           |const AS (SELECT
           |  [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576] AS bands,
           |  [0,4,8,12,16,22,30,40,52,66,84,106,136,192] AS bs,
           |  [0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0] AS pretab,
           |  [-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,-0.0142,-0.0037] AS ci),
           |base AS (
           |  SELECT id, g, ch, id + 11*g AS k,
           |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
           |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult,
           |         CASE WHEN g = 0 THEN id % 2 ELSE 0 END AS preflag
           |  FROM ids, gs, chs),
           |spec AS (
           |  SELECT id, g, ch, gg, mult, preflag,
           |    list_transform(range(0, 576), i ->
           |      CASE WHEN i >= 2*(20 + k%5) + 4*(4 + k%3) THEN 0 ELSE
           |        (CASE WHEN (k+i)%5 < 2 THEN -1 ELSE 1 END) *
           |        (CASE WHEN i < 36 THEN (k+i)%4
           |              WHEN i < 2*(20 + k%5) THEN
           |                CASE (k+i)%4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1
           |                     ELSE 15 + (k+i)%8 END
           |              ELSE (k+i)%2 END)
           |      END) AS isv
           |  FROM base),
           |smap AS (
           |  SELECT m.t, m.j, m.w,
           |         len(list_filter(c.bs, x -> x <= m.j)) - 1 AS s,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS lo,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j)) + 1]
           |           - c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS width
           |  FROM (SELECT t, 6*(t//18) + (t%6) AS j, (t%18)//6 AS w
           |        FROM (SELECT unnest(range(0, 576)) AS t)) m, const c),
           |xrow AS (
           |  SELECT sp.id, sp.g, sp.ch, m.t,
           |    CASE WHEN sp.g = 0 THEN
           |      CASE WHEN sp.isv[m.t+1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[m.t+1]) * pow(abs(sp.isv[m.t+1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210) - sp.mult * (
           |          (CASE WHEN len(list_filter(c.bands, x -> x <= m.t)) - 1 >= 21 THEN 0
           |                ELSE (sp.id + (len(list_filter(c.bands, x -> x <= m.t)) - 1)) % 4 END)
           |          + sp.preflag * c.pretab[len(list_filter(c.bands, x -> x <= m.t))]))
           |      END
           |    ELSE
           |      CASE WHEN sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]) *
           |        pow(abs(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210 - 8*((sp.id + 2*m.w) % 4)) -
           |          sp.mult * (CASE WHEN m.s >= 12 THEN 0 ELSE (sp.id + m.s + m.w) % 4 END))
           |      END
           |    END AS v
           |  FROM spec sp, smap m, const c),
           |xrl AS (SELECT id, g, ch, list(v ORDER BY t) AS v FROM xrow GROUP BY id, g, ch),
           |al AS (
           |  SELECT x.id, x.g, x.ch,
           |    CASE WHEN x.g = 1 THEN x.v ELSE
           |      list_transform(range(0, 576), i -> CASE
           |        WHEN i % 18 >= 10 AND i < 558 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
           |          x.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
           |        WHEN i % 18 <= 7 AND i >= 18 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
           |          x.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
           |        ELSE x.v[i+1] END)
           |    END AS v
           |  FROM xrl x, const c),
           |im AS (
           |  SELECT a.id, a.ch, a.g, sb.sb,
           |    CASE WHEN a.g = 0 THEN
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 18), kk ->
           |          a.v[18*sb.sb + kk + 1] * cos(pi()/72 * (2*i + 19) * (2*kk + 1))))
           |        * (CASE WHEN i < 18 THEN sin(pi()/36 * (i + 0.5))
           |                WHEN i < 24 THEN 1.0
           |                WHEN i < 30 THEN sin(pi()/12 * (i - 18 + 0.5))
           |                ELSE 0.0 END))
           |    ELSE
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 3), w ->
           |          CASE WHEN i - 6 - 6*w >= 0 AND i - 6 - 6*w < 12 THEN
           |            list_sum(list_transform(range(0, 6), kk ->
           |              a.v[18*sb.sb + 6*w + kk + 1] * cos(pi()/24 * (2*(i - 6 - 6*w) + 7) * (2*kk + 1))))
           |            * sin(pi()/12 * ((i - 6 - 6*w) + 0.5))
           |          ELSE 0.0 END)))
           |    END AS z
           |  FROM al a, (SELECT unnest(range(0, 32)) AS sb) sb),
           |ts AS (
           |  SELECT z0.id, z0.ch, z0.sb,
           |    list_transform(range(0, 36), t -> (
           |      CASE WHEN t < 18 THEN z0.z[t+1]
           |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
           |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
           |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
           |  WHERE z0.g = 0 AND z1.g = 1),
           |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
           |vmat AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 36), t ->
           |      list_transform(range(0, 64), o ->
           |        list_sum(list_transform(range(0, 32), kk ->
           |          cos((16 + o) * (2*kk + 1) * pi()/64) * m[kk+1][t+1])))) AS vm
           |  FROM mat),
           |pcm AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 1152), p ->
           |      CAST(greatest(-32768.0, least(32767.0, floor(
           |        list_sum(list_transform(range(0, 16), n ->
           |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
           |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
           |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
           |        * 32768.0 + 0.5))) AS INT)) AS q
           |  FROM vmat)
           |SELECT id, ch::INT AS channel, 0::INT AS ms_stereo,
           |  1152::INT AS n_samples,
           |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
           |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
           |  list_sum(q)::BIGINT AS pcm_sum,
           |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
           |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
           |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_mixed" -> Q(multimodalMp3Mixed, Some(
      // restates mp3MixedAssets' chain: granule 0 block_type 2 MIXED —
      // long requant in place below sample 36 (2 long subbands), the
      // short reorder from band 3 above, alias butterflies at the ONE
      // long boundary, type-0 long windows on subbands 0–1 + short
      // 12-point IMDCTs above — granule 1 block_type 3 (stop window,
      // long layout incl. pretab/preflag, full alias); shared tail
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |gs AS (SELECT unnest(range(0, 2)) AS g),
           |chs AS (SELECT unnest(range(0, 2)) AS ch),
           |const AS (SELECT
           |  [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576] AS bands,
           |  [0,4,8,12,16,22,30,40,52,66,84,106,136,192] AS bs,
           |  [0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0] AS pretab,
           |  [-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,-0.0142,-0.0037] AS ci),
           |base AS (
           |  SELECT id, g, ch, id + 4 + 13*g AS k,
           |         160 + (5*id + 17*g + 29*ch) % 40 AS gg,
           |         CASE WHEN (id+g)%2 = 0 THEN 0.5 ELSE 1.0 END AS mult,
           |         CASE WHEN g = 1 THEN id % 2 ELSE 0 END AS preflag
           |  FROM ids, gs, chs),
           |spec AS (
           |  SELECT id, g, ch, gg, mult, preflag,
           |    list_transform(range(0, 576), i ->
           |      CASE WHEN i >= 2*(20 + k%5) + 4*(4 + k%3) THEN 0 ELSE
           |        (CASE WHEN (k+i)%5 < 2 THEN -1 ELSE 1 END) *
           |        (CASE WHEN i < 36 THEN (k+i)%4
           |              WHEN i < 2*(20 + k%5) THEN
           |                CASE (k+i)%4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1
           |                     ELSE 15 + (k+i)%8 END
           |              ELSE (k+i)%2 END)
           |      END) AS isv
           |  FROM base),
           |smap AS (
           |  SELECT m.t, m.j, m.w,
           |         len(list_filter(c.bs, x -> x <= m.j)) - 1 AS s,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS lo,
           |         c.bs[len(list_filter(c.bs, x -> x <= m.j)) + 1]
           |           - c.bs[len(list_filter(c.bs, x -> x <= m.j))] AS width
           |  FROM (SELECT t, 6*(t//18) + (t%6) AS j, (t%18)//6 AS w
           |        FROM (SELECT unnest(range(0, 576)) AS t)) m, const c),
           |xrow AS (
           |  SELECT sp.id, sp.g, sp.ch, m.t,
           |    CASE WHEN sp.g = 1 OR m.t < 36 THEN
           |      CASE WHEN sp.isv[m.t+1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[m.t+1]) * pow(abs(sp.isv[m.t+1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210) - sp.mult * (
           |          (CASE WHEN len(list_filter(c.bands, x -> x <= m.t)) - 1 >= 21 THEN 0
           |                ELSE (sp.id + (len(list_filter(c.bands, x -> x <= m.t)) - 1)) % 4 END)
           |          + sp.preflag * c.pretab[len(list_filter(c.bands, x -> x <= m.t))]))
           |      END
           |    ELSE
           |      CASE WHEN sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1] = 0 THEN 0.0 ELSE
           |        sign(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]) *
           |        pow(abs(sp.isv[3*m.lo + m.w*m.width + (m.j - m.lo) + 1]), 4.0/3.0) *
           |        pow(2.0, 0.25*(sp.gg - 210 - 8*((sp.id + 2*m.w) % 4)) -
           |          sp.mult * (CASE WHEN m.s >= 12 THEN 0 ELSE (sp.id + m.s + m.w) % 4 END))
           |      END
           |    END AS v
           |  FROM spec sp, smap m, const c),
           |xrl AS (SELECT id, g, ch, list(v ORDER BY t) AS v FROM xrow GROUP BY id, g, ch),
           |al AS (
           |  SELECT x.id, x.g, x.ch,
           |    CASE WHEN x.g = 0 THEN
           |      list_transform(range(0, 576), i -> CASE
           |        WHEN i % 18 >= 10 AND i < 18 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
           |          x.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
           |        WHEN i % 18 <= 7 AND i >= 18 AND i < 36 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
           |          x.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
           |        ELSE x.v[i+1] END)
           |    ELSE
           |      list_transform(range(0, 576), i -> CASE
           |        WHEN i % 18 >= 10 AND i < 558 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)])) -
           |          x.v[i + 36 - 2*(i%18)] * (c.ci[18 - (i%18)]/sqrt(1.0 + c.ci[18 - (i%18)]*c.ci[18 - (i%18)]))
           |        WHEN i % 18 <= 7 AND i >= 18 THEN
           |          x.v[i+1] * (1.0/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1])) +
           |          x.v[i - 2*(i%18)] * (c.ci[(i%18) + 1]/sqrt(1.0 + c.ci[(i%18) + 1]*c.ci[(i%18) + 1]))
           |        ELSE x.v[i+1] END)
           |    END AS v
           |  FROM xrl x, const c),
           |im AS (
           |  SELECT a.id, a.ch, a.g, sb.sb,
           |    CASE WHEN a.g = 1 THEN
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 18), kk ->
           |          a.v[18*sb.sb + kk + 1] * cos(pi()/72 * (2*i + 19) * (2*kk + 1))))
           |        * (CASE WHEN i < 6 THEN 0.0
           |                WHEN i < 12 THEN sin(pi()/12 * (i - 6 + 0.5))
           |                WHEN i < 18 THEN 1.0
           |                ELSE sin(pi()/36 * (i + 0.5)) END))
           |    WHEN sb.sb < 2 THEN
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 18), kk ->
           |          a.v[18*sb.sb + kk + 1] * cos(pi()/72 * (2*i + 19) * (2*kk + 1))))
           |        * sin(pi()/36 * (i + 0.5)))
           |    ELSE
           |      list_transform(range(0, 36), i ->
           |        list_sum(list_transform(range(0, 3), w ->
           |          CASE WHEN i - 6 - 6*w >= 0 AND i - 6 - 6*w < 12 THEN
           |            list_sum(list_transform(range(0, 6), kk ->
           |              a.v[18*sb.sb + 6*w + kk + 1] * cos(pi()/24 * (2*(i - 6 - 6*w) + 7) * (2*kk + 1))))
           |            * sin(pi()/12 * ((i - 6 - 6*w) + 0.5))
           |          ELSE 0.0 END)))
           |    END AS z
           |  FROM al a, (SELECT unnest(range(0, 32)) AS sb) sb),
           |ts AS (
           |  SELECT z0.id, z0.ch, z0.sb,
           |    list_transform(range(0, 36), t -> (
           |      CASE WHEN t < 18 THEN z0.z[t+1]
           |           ELSE z1.z[t-18+1] + z0.z[18 + t-18 + 1] END)
           |      * (CASE WHEN z0.sb % 2 = 1 AND t % 2 = 1 THEN -1.0 ELSE 1.0 END)) AS s
           |  FROM im z0 JOIN im z1 ON z0.id = z1.id AND z0.ch = z1.ch AND z0.sb = z1.sb
           |  WHERE z0.g = 0 AND z1.g = 1),
           |mat AS (SELECT id, ch, list(s ORDER BY sb) AS m FROM ts GROUP BY id, ch),
           |vmat AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 36), t ->
           |      list_transform(range(0, 64), o ->
           |        list_sum(list_transform(range(0, 32), kk ->
           |          cos((16 + o) * (2*kk + 1) * pi()/64) * m[kk+1][t+1])))) AS vm
           |  FROM mat),
           |pcm AS (
           |  SELECT id, ch,
           |    list_transform(range(0, 1152), p ->
           |      CAST(greatest(-32768.0, least(32767.0, floor(
           |        list_sum(list_transform(range(0, 16), n ->
           |          (sin(pi() * ((p % 32) + 32*n + 0.5) / 512) / 32) *
           |          (CASE WHEN (p // 32) - n < 0 THEN 0.0
           |                ELSE vm[(p // 32) - n + 1][(CASE WHEN n % 2 = 0 THEN p % 32 ELSE 32 + p % 32 END) + 1] END)))
           |        * 32768.0 + 0.5))) AS INT)) AS q
           |  FROM vmat)
           |SELECT id, ch::INT AS channel, 0::INT AS ms_stereo,
           |  1152::INT AS n_samples,
           |  len(list_filter(q, x -> x = 32767 OR x = -32768))::INT AS n_clipped,
           |  len(list_filter(q, x -> x <> 0))::INT AS n_nonzero,
           |  list_sum(q)::BIGINT AS pcm_sum,
           |  list_sum(list_transform(q, x -> abs(x)))::BIGINT AS pcm_abs_sum,
           |  list_sum(list_transform(range(0, 1152), p -> q[p+1] * (p+1)))::BIGINT AS pos_sum
           |FROM pcm ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_codebook" -> Q(multimodalMp3Codebook, Some(
      // restates the codebook gate's spectral formulas: 16 big values
      // (all region0, coded by the USER-SUPPLIED table mounted on real
      // id 1) + 8 count1 samples — mag (id+i)%2, negative iff
      // (id+i)%3 = 0 — plus the contract bits themselves (decodes with
      // tables, strict-rejects without)
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
        |v AS (
        |  SELECT id, list_transform(range(0, 24), i ->
        |    (CASE WHEN (id+i)%3 = 0 THEN -1 ELSE 1 END) * ((id+i)%2)) AS isv
        |  FROM ids)
        |SELECT id, 1::INT AS decodes_with_tables, 1::INT AS rejects_without,
        |  len(list_filter(isv, x -> x <> 0))::INT AS n_nonzero,
        |  list_sum(isv)::BIGINT AS is_sum,
        |  list_sum(list_transform(range(0, 24), i -> isv[i+1] * (i+1)))::BIGINT AS pos_sum
        |FROM v ORDER BY id""".stripMargin)),
    "multimodal_h264_ipcm" -> Q(multimodalH264IPcm, Some(
      // restates h264IPcmAssets: every PIXEL byte is an md5-chain hex
      // pair and every header field an id formula — so the Annex-B walk,
      // SPS/PPS parse (incl. the round-14 §7.3.2.2 tail), the slice-
      // header Exp-Golomb walk (poc/deblocking/redundant branches) and
      // the I_PCM alignment + sample copy are all oracle-checked, with
      // position-weighted checksums pinning sample PLACEMENT per plane
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         array_to_string(list_transform(range(0, 48), i -> md5(text || '_ipcm_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 30),
        |m AS (SELECT id, hx, unnest(range(0, 1 + id % 2)) AS mb FROM p),
        |b AS (SELECT id, mb,
        |        list_transform(range(0, 384), j ->
        |          (strpos('0123456789abcdef', substr(hx, ((mb*384 + j)*2 + 1)::INT, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(hx, ((mb*384 + j)*2 + 2)::INT, 1)) - 1)) AS v
        |      FROM m)
        |SELECT id, mb::INT AS mb,
        |  (id % 16)::INT AS frame_num,
        |  (CASE WHEN id % 3 = 0 THEN 0 ELSE id % 16 END)::INT AS poc_lsb,
        |  (21 + id % 5 + id % 7)::INT AS slice_qp,
        |  list_sum(v[1:256])::BIGINT AS luma_sum,
        |  list_sum(list_transform(range(0, 256), j -> v[j+1] * (j+1)))::BIGINT AS luma_pos_sum,
        |  list_sum(v[257:320])::BIGINT AS cb_sum,
        |  list_sum(v[321:384])::BIGINT AS cr_sum,
        |  list_sum(list_transform(range(0, 128), j -> v[256 + j + 1] * (j+1)))::BIGINT AS chroma_pos_sum
        |FROM b ORDER BY id, mb""".stripMargin)),
    "multimodal_h264_i16x16" -> Q(multimodalH264I16x16, Some(
      // restates h264I16Assets' CAVLC Intra_16x16 decode end to end
      // (round 15, r14 VERDICT #7): the formula levels through inverse
      // zig-zag, the DC Hadamard (as the exact ±1 tensor sum), §8.5.10
      // DC scaling with its rounding branch, §8.5.12 AC scaling, the
      // 4x4 inverse core transform's two butterfly stages (arithmetic
      // >>1 as floor(x/2)), then the STAGED prediction chain — mb0 DC
      // 128, mb1 Horizontal off mb0's right column, mb2 Vertical off
      // mb0's bottom row, mb3 Plane off mb1/mb2 borders — with the
      // 0..255 clip at each reconstruction. All integers: hash-exact.
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |par AS (SELECT id, 20 + (5 * id) % 12 AS qp FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |mbs AS (SELECT unnest(range(0, 4)) AS mb),
           |dcr AS (SELECT p.id, m.mb, p.qp,
           |    list_transform(range(0, 16), r ->
           |      CASE WHEN (p.id + m.mb + (list_position(c.zz, r) - 1)) % 4 = 0
           |           THEN ((p.id + m.mb + (list_position(c.zz, r) - 1)) % 5) - 2
           |           ELSE 0 END) AS d
           |  FROM par p, mbs m, cst c),
           |had AS (SELECT id, mb, qp,
           |    list_transform(range(0, 16), i ->
           |      list_sum(list_transform(range(0, 16), ab ->
           |        (CASE WHEN (((i//4)%2)*((ab//4)%2) + ((i//4)//2)*((ab//4)//2)) % 2 = 0
           |              THEN 1 ELSE -1 END) *
           |        (CASE WHEN (((i%4)%2)*((ab%4)%2) + ((i%4)//2)*((ab%4)//2)) % 2 = 0
           |              THEN 1 ELSE -1 END) * d[ab + 1]))) AS f
           |  FROM dcr),
           |dcv AS (SELECT h.id, h.mb, h.qp,
           |    list_transform(h.f, f ->
           |      CAST(floor((f * 16 * c.v[h.qp % 6 + 1][1] + pow(2, 5 - h.qp // 6))
           |        / pow(2, 6 - h.qp // 6)) AS BIGINT)) AS dc
           |  FROM had h, cst c),
           |blks AS (SELECT unnest(range(0, 16)) AS blk),
           |dq AS (SELECT d.id, d.mb, d.qp, b.blk,
           |    list_transform(range(0, 16), ri -> CASE WHEN ri = 0 THEN
           |        d.dc[4 * (2*((b.blk//4)//2) + (b.blk%4)//2)
           |             + 2*((b.blk//4)%2) + (b.blk%4)%2 + 1]
           |      ELSE
           |        (CASE WHEN (d.id + d.mb + b.blk + (list_position(c.zz, ri) - 2)) % 6 = 0
           |              THEN ((d.id + b.blk * (list_position(c.zz, ri) - 1) + d.mb) % 5) - 2
           |              ELSE 0 END)
           |        * c.v[d.qp % 6 + 1]
           |             [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                   WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                   ELSE 3 END]
           |        * CAST(pow(2, d.qp // 6) AS BIGINT)
           |      END) AS d
           |  FROM dcv d, blks b, cst c),
           |it1 AS (SELECT id, mb, blk,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, mb, blk,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |resm AS (SELECT id, mb, list(r ORDER BY blk) AS rl FROM res4 GROUP BY id, mb),
           |r16 AS (SELECT id, mb,
           |    list_transform(range(0, 256), i ->
           |      rl[4 * (2*(((i//16)//4)//2) + ((i%16)//4)//2)
           |         + 2*(((i//16)//4)%2) + ((i%16)//4)%2 + 1]
           |        [4 * ((i//16) % 4) + (i%16) % 4 + 1]) AS r
           |  FROM resm),
           |rec0 AS (SELECT id, list_transform(range(0, 256), i ->
           |    greatest(0, least(255, 128 + r[i+1]))) AS p FROM r16 WHERE mb = 0),
           |rec1 AS (SELECT a.id, list_transform(range(0, 256), i ->
           |    greatest(0, least(255, b.p[(i//16)*16 + 16] + a.r[i+1]))) AS p
           |  FROM r16 a JOIN rec0 b ON a.id = b.id WHERE a.mb = 1),
           |rec2 AS (SELECT a.id, list_transform(range(0, 256), i ->
           |    greatest(0, least(255, b.p[241 + i%16] + a.r[i+1]))) AS p
           |  FROM r16 a JOIN rec0 b ON a.id = b.id WHERE a.mb = 2),
           |pl AS (SELECT r1.id,
           |    -- k = 7 reaches x/y = -1: the TOP-LEFT corner pixel, which
           |    -- lives in mb0 (rec0's bottom-right), not in mb1/mb2
           |    list_sum(list_transform(range(0, 8), k ->
           |      (k+1) * (r1.p[249 + k] -
           |        CASE WHEN k = 7 THEN r0.p[256] ELSE r1.p[247 - k] END))) AS hsum,
           |    list_sum(list_transform(range(0, 8), k ->
           |      (k+1) * (r2.p[(8+k)*16 + 16] -
           |        CASE WHEN k = 7 THEN r0.p[256] ELSE r2.p[(6-k)*16 + 16] END))) AS vsum,
           |    16 * (r2.p[256] + r1.p[256]) AS pa
           |  FROM rec1 r1 JOIN rec2 r2 ON r1.id = r2.id
           |  JOIN rec0 r0 ON r0.id = r1.id),
           |rec3 AS (SELECT a.id, list_transform(range(0, 256), i ->
           |    greatest(0, least(255,
           |      greatest(0, least(255, CAST(floor((pl.pa
           |        + CAST(floor((5 * pl.hsum + 32) / 64.0) AS BIGINT) * (i%16 - 7)
           |        + CAST(floor((5 * pl.vsum + 32) / 64.0) AS BIGINT) * (i//16 - 7)
           |        + 16) / 32.0) AS BIGINT)))
           |      + a.r[i+1]))) AS p
           |  FROM r16 a JOIN pl ON a.id = pl.id WHERE a.mb = 3),
           |recs AS (
           |  SELECT id, 0 AS mb, p FROM rec0 UNION ALL
           |  SELECT id, 1, p FROM rec1 UNION ALL
           |  SELECT id, 2, p FROM rec2 UNION ALL
           |  SELECT id, 3, p FROM rec3)
           |SELECT r.id, r.mb::INT AS mb,
           |  ([2,1,0,3][r.mb + 1])::INT AS pred_mode, p2.qp::INT AS qp,
           |  list_sum(r.p)::BIGINT AS sum_luma,
           |  CAST(list_sum(list_transform(range(0, 256), i -> r.p[i+1] *
           |    ((16*(r.mb//2) + i//16) * 32 + 16*(r.mb%2) + i%16 + 1))) AS BIGINT) AS wsum_luma,
           |  list_aggregate(r.p, 'min')::INT AS min_luma,
           |  list_aggregate(r.p, 'max')::INT AS max_luma
           |FROM recs r JOIN par p2 ON p2.id = r.id
           |ORDER BY r.id, r.mb""".stripMargin)),
    "multimodal_h264_i4x4" -> Q(multimodalH264I4x4, Some(
      // restates h264I4x4Assets' MIXED I4x4/I16 decode end to end
      // (round 16 — the I_NxN rung): mb0 is a zero-residual I16 DC MB
      // (flat 128; the I16 residual math is pinned by the i16x16
      // gate), and mbs 1..3 decode through a RECURSIVE plane walk —
      // one iteration per 4x4 block in raster-MB + blkIdx order,
      // restating the §8.5.12 dequant (all 16 positions) + inverse
      // core transform, the closed-form mode assignment, the
      // decode-order top-right availability predicate (the Z-order
      // index comparison) with the §8.3.1.2 p[3,-1] substitution, and
      // ALL NINE prediction formulas with the 0..255 clip per block.
      // All integers: hash-exact.
      raw"""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |qps AS (SELECT id, 20 + (5*id) % 12 AS qp0,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 AS qp1,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 + (id+2)%5 - 2 AS qp2,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 + (id+2)%5 - 2 + (id+3)%5 - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |geo AS (
           |  SELECT i.id, k.k, 1 + k.k // 16 AS m, k.k % 16 AS blk,
           |    2*((k.k % 16 // 4) % 2) + (k.k % 16 % 4) % 2 AS bx,
           |    2*((k.k % 16 // 4) // 2) + (k.k % 16 % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 48)) AS k) k),
           |geo2 AS (
           |  SELECT id, k, m, blk, 4*(m % 2) + bx AS gx, 4*(m // 2) + by AS gy,
           |    CASE WHEN m = 1 AND by = 0 THEN
           |           (CASE (id + blk) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 8 END)
           |         WHEN m = 2 AND bx = 0 THEN
           |           (CASE (id + blk) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 7 END)
           |         WHEN m = 2 THEN (id + 1 + blk) % 9
           |         ELSE (id + blk) % 9 END AS md
           |  FROM geo),
           |geoq AS (
           |  SELECT g.*,
           |    g.gy > 0 AND g.gx + 1 < 8 AND
           |      (((g.gy-1) // 4)*2 + (g.gx+1) // 4)*16
           |        + 4*(2*(((g.gy-1) % 4) // 2) + ((g.gx+1) % 4) // 2)
           |        + 2*(((g.gy-1) % 4) % 2) + ((g.gx+1) % 4) % 2
           |      < ((g.gy // 4)*2 + g.gx // 4)*16
           |        + 4*(2*((g.gy % 4) // 2) + (g.gx % 4) // 2)
           |        + 2*((g.gy % 4) % 2) + (g.gx % 4) % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id),
           |dq AS (SELECT g.id, g.k,
           |    list_transform(range(0, 16), ri ->
           |      (CASE WHEN (g.id + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 7 = 0
           |            THEN ((g.id + g.m * ((list_position(c.zz, ri) - 1) + 2) + g.blk) % 5) - 2
           |            ELSE 0 END)
           |      * c.v[g.qp % 6 + 1]
           |           [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                 WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                 ELSE 3 END]
           |      * CAST(pow(2, g.qp // 6) AS BIGINT)) AS d
           |  FROM geoq g, cst c),
           |it1 AS (SELECT id, k,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, k,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |walk AS (
           |  SELECT id, 0 AS k, list_transform(range(0, 1024), i -> 128) AS p FROM ids
           |  UNION ALL
           |  SELECT s.id, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 4 = s.gx AND (i // 32) // 4 = s.gy THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.tp[(i%32)%4 + 2]
           |            WHEN 1 THEN s.lp[(i//32)%4 + 2]
           |            WHEN 2 THEN
           |              CASE WHEN s.gx > 0 AND s.gy > 0 THEN
           |                (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+4)//8
           |              WHEN s.gx > 0 THEN (s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+2)//4
           |              WHEN s.gy > 0 THEN (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+2)//4
           |              ELSE 128 END
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%4 = 3 AND (i//32)%4 = 3
           |                THEN (s.tp[8] + 3*s.tp[9] + 2)//4
           |                ELSE (s.tp[(i%32)%4 + (i//32)%4 + 2]
           |                    + 2*s.tp[(i%32)%4 + (i//32)%4 + 3]
           |                    + s.tp[(i%32)%4 + (i//32)%4 + 4] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%4 > (i//32)%4 THEN
           |                (s.tp[(i%32)%4 - (i//32)%4] + 2*s.tp[(i%32)%4 - (i//32)%4 + 1]
           |                 + s.tp[(i%32)%4 - (i//32)%4 + 2] + 2)//4
           |              WHEN (i%32)%4 < (i//32)%4 THEN
           |                (s.lp[(i//32)%4 - (i%32)%4] + 2*s.lp[(i//32)%4 - (i%32)%4 + 1]
           |                 + s.lp[(i//32)%4 - (i%32)%4 + 2] + 2)//4
           |              ELSE (s.tp[2] + 2*s.tp[1] + s.lp[2] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%4) - (i//32)%4 >= 0
           |                    AND (2*((i%32)%4) - (i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i%32)%4) - (i//32)%4 >= 1 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2]
           |                 + 2*s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i%32)%4) - (i//32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.lp[(i//32)%4 + 1] + 2*s.lp[(i//32)%4]
           |                    + s.lp[(i//32)%4 - 1] + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%4) - (i%32)%4 >= 0
           |                    AND (2*((i//32)%4) - (i%32)%4) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i//32)%4) - (i%32)%4 >= 1 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2]
           |                 + 2*s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i//32)%4) - (i%32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.tp[(i%32)%4 + 1] + 2*s.tp[(i%32)%4]
           |                    + s.tp[(i%32)%4 - 1] + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 3] + 1)//2
           |              ELSE (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + 2*s.tp[(i%32)%4 + ((i//32)%4)//2 + 3]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 4] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%4 + 2*((i//32)%4) > 5 THEN s.lp[5]
           |              WHEN (i%32)%4 + 2*((i//32)%4) = 5 THEN (s.lp[4] + 3*s.lp[5] + 2)//4
           |              WHEN ((i%32)%4 + 2*((i//32)%4)) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 3] + 1)//2
           |              ELSE (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + 2*s.lp[(i//32)%4 + ((i%32)%4)//2 + 3]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 4] + 2)//4 END
           |          END) + s.r[4*((i//32)%4) + (i%32)%4 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT w.id, w.k, w.p, g.gx, g.gy, g.md, r.r,
           |      list_transform(range(-1, 8), xx ->
           |        CASE WHEN g.gy = 0 THEN 0
           |             WHEN xx = -1 THEN
           |               (CASE WHEN g.gx = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             WHEN xx > 3 AND NOT g.htr THEN w.p[(4*g.gy - 1)*32 + 4*g.gx + 4]
           |             ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx + xx + 1] END) AS tp,
           |      list_transform(range(-1, 4), yy ->
           |        CASE WHEN g.gx = 0 THEN 0
           |             WHEN yy = -1 THEN
           |               (CASE WHEN g.gy = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             ELSE w.p[(4*g.gy + yy)*32 + 4*g.gx] END) AS lp
           |    FROM walk w
           |    JOIN geoq g ON g.id = w.id AND g.k = w.k
           |    JOIN res4 r ON r.id = w.id AND r.k = w.k
           |    WHERE w.k < 48
           |  ) s),
           |fin AS (SELECT id, p FROM walk WHERE k = 48),
           |msum AS (SELECT id, m, SUM((blk + 1) * md) AS mode_sum FROM geoq GROUP BY id, m),
           |mbrows AS (
           |  SELECT f.id, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.mb, 1 AS is_i4x4, ms.mode_sum, 15 AS cbp_luma,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id),
           |mb0 AS (
           |  SELECT id, 0 AS mb, 0 AS is_i4x4, 2 AS mode_sum, 0 AS cbp_luma,
           |    qp0 AS qp, 128 * 256 AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j ->
           |      128 * ((j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    128 AS min_luma, 128 AS max_luma
           |  FROM qps)
           |SELECT id, mb::INT AS mb, is_i4x4::INT AS is_i4x4,
           |  mode_sum::BIGINT AS mode_sum, cbp_luma::INT AS cbp_luma, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, mb""".stripMargin)),
    "multimodal_h264_i8x8" -> Q(multimodalH264I8x8, Some(
      // restates h264I8x8Assets' Intra_8x8 decode end to end (round
      // 17 — the High-profile I-frame rung): mb0 a flat-128 I16 DC MB,
      // mbs 1..3 walked RECURSIVELY one 8x8 block per iteration,
      // restating the §8.3.2.2.1 reference FILTERING (the 121 low-pass
      // over top/left/corner with end clamps and the substitution-
      // then-filter top-right rule), all nine §8.3.2 prediction
      // formulas over the FILTERED refs (corner-index −1 arms
      // included), the §8.5.13.1 normAdjust8x8 dequant with BOTH qp
      // branches (the rounding-add below qp 36, the shift at/above),
      // and the §8.5.13.2 two-pass 8-point integer butterfly. All
      // integers: hash-exact.
      raw"""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |qps AS (SELECT id, 20 + (5*id) % 12 AS qp0,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 AS qp1,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 + (id+2)%5 - 2 AS qp2,
           |  20 + (5*id) % 12 + (id+1)%5 - 2 + (id+2)%5 - 2 + (id+3)%5 - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,8,16,9,2,3,10,17,24,32,25,18,11,4,5,12,19,26,33,40,48,41,34,
           |   27,20,13,6,7,14,21,28,35,42,49,56,57,50,43,36,29,22,15,23,30,37,
           |   44,51,58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63] AS zz8,
           |  [[20,18,32,19,25,24],[22,19,35,21,28,26],[26,23,42,24,33,31],
           |   [28,25,45,26,35,33],[32,28,51,30,40,38],[36,32,58,34,46,43]] AS v8,
           |  [0,3,4,3,3,1,5,1,4,5,2,5,3,1,5,1] AS cp),
           |geo AS (
           |  SELECT i.id, k.k, 1 + k.k // 4 AS m, k.k % 4 AS b,
           |    (k.k % 4) % 2 AS bx, (k.k % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 12)) AS k) k),
           |geo2 AS (
           |  SELECT id, k, m, b, 2*(m % 2) + bx AS gx8, 2*(m // 2) + by AS gy8,
           |    CASE WHEN m = 1 AND by = 0 THEN
           |           (CASE (id + b) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 8 END)
           |         WHEN m = 2 AND bx = 0 THEN
           |           (CASE (id + b) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 7 END)
           |         WHEN m = 2 THEN (id + 1 + 3*b) % 9
           |         ELSE (id + 3*b) % 9 END AS md
           |  FROM geo),
           |geoq AS (
           |  SELECT g.*, g.gx8 > 0 AS hl, g.gy8 > 0 AS ht,
           |    g.gx8 > 0 AND g.gy8 > 0 AS hc,
           |    g.gy8 > 0 AND g.gx8 + 1 < 4 AND
           |      (2*((g.gy8-1) // 2) + (g.gx8+1) // 2)*4
           |        + ((g.gy8-1) % 2)*2 + (g.gx8+1) % 2
           |      < (2*(g.gy8 // 2) + g.gx8 // 2)*4 + (g.gy8 % 2)*2 + g.gx8 % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id),
           |deq AS (SELECT g.id, g.k,
           |    -- LevelScale8x8 = 16 (flat weightScale) x normAdjust8x8:
           |    -- the x16 does NOT cancel against the 8x8 shifts
           |    list_transform(range(0, 64), ri ->
           |      CASE WHEN g.qp >= 36 THEN
           |        (CASE WHEN (g.id + g.m + g.b + (list_position(c.zz8, ri) - 1)) % 13 = 0
           |              THEN ((g.id + g.m * ((list_position(c.zz8, ri) - 1) + 3) + g.b) % 5) - 2
           |              ELSE 0 END)
           |        * 16 * c.v8[g.qp % 6 + 1][c.cp[4*((ri//8) % 4) + (ri%8) % 4 + 1] + 1]
           |        * CAST(pow(2, g.qp // 6 - 6) AS BIGINT)
           |      ELSE
           |        CAST(floor((
           |          (CASE WHEN (g.id + g.m + g.b + (list_position(c.zz8, ri) - 1)) % 13 = 0
           |                THEN ((g.id + g.m * ((list_position(c.zz8, ri) - 1) + 3) + g.b) % 5) - 2
           |                ELSE 0 END)
           |          * 16 * c.v8[g.qp % 6 + 1][c.cp[4*((ri//8) % 4) + (ri%8) % 4 + 1] + 1]
           |          + CAST(pow(2, 5 - g.qp // 6) AS BIGINT)
           |        ) / pow(2, 6 - g.qp // 6)) AS BIGINT)
           |      END) AS d
           |  FROM geoq g, cst c),
           |ea AS (SELECT id, k,
           |    list_transform(range(0, 64), i -> CASE i % 8
           |      WHEN 0 THEN d[8*(i//8)+1] + d[8*(i//8)+5]
           |      WHEN 1 THEN -d[8*(i//8)+4] + d[8*(i//8)+6] - d[8*(i//8)+8]
           |                  - CAST(floor(d[8*(i//8)+8] / 2.0) AS BIGINT)
           |      WHEN 2 THEN d[8*(i//8)+1] - d[8*(i//8)+5]
           |      WHEN 3 THEN d[8*(i//8)+2] + d[8*(i//8)+8] - d[8*(i//8)+4]
           |                  - CAST(floor(d[8*(i//8)+4] / 2.0) AS BIGINT)
           |      WHEN 4 THEN CAST(floor(d[8*(i//8)+3] / 2.0) AS BIGINT) - d[8*(i//8)+7]
           |      WHEN 5 THEN -d[8*(i//8)+2] + d[8*(i//8)+8] + d[8*(i//8)+6]
           |                  + CAST(floor(d[8*(i//8)+6] / 2.0) AS BIGINT)
           |      WHEN 6 THEN d[8*(i//8)+3] + CAST(floor(d[8*(i//8)+7] / 2.0) AS BIGINT)
           |      ELSE d[8*(i//8)+4] + d[8*(i//8)+6] + d[8*(i//8)+2]
           |                  + CAST(floor(d[8*(i//8)+2] / 2.0) AS BIGINT)
           |      END) AS e
           |  FROM deq),
           |eb AS (SELECT id, k,
           |    list_transform(range(0, 64), i -> CASE i % 8
           |      WHEN 0 THEN e[8*(i//8)+1] + e[8*(i//8)+7]
           |      WHEN 1 THEN e[8*(i//8)+2] + CAST(floor(e[8*(i//8)+8] / 4.0) AS BIGINT)
           |      WHEN 2 THEN e[8*(i//8)+3] + e[8*(i//8)+5]
           |      WHEN 3 THEN e[8*(i//8)+4] + CAST(floor(e[8*(i//8)+6] / 4.0) AS BIGINT)
           |      WHEN 4 THEN e[8*(i//8)+3] - e[8*(i//8)+5]
           |      WHEN 5 THEN CAST(floor(e[8*(i//8)+4] / 4.0) AS BIGINT) - e[8*(i//8)+6]
           |      WHEN 6 THEN e[8*(i//8)+1] - e[8*(i//8)+7]
           |      ELSE e[8*(i//8)+8] - CAST(floor(e[8*(i//8)+2] / 4.0) AS BIGINT)
           |      END) AS f
           |  FROM ea),
           |ec AS (SELECT id, k,
           |    list_transform(range(0, 64), i -> CASE i % 8
           |      WHEN 0 THEN f[8*(i//8)+1] + f[8*(i//8)+8]
           |      WHEN 1 THEN f[8*(i//8)+3] + f[8*(i//8)+6]
           |      WHEN 2 THEN f[8*(i//8)+5] + f[8*(i//8)+4]
           |      WHEN 3 THEN f[8*(i//8)+7] + f[8*(i//8)+2]
           |      WHEN 4 THEN f[8*(i//8)+7] - f[8*(i//8)+2]
           |      WHEN 5 THEN f[8*(i//8)+5] - f[8*(i//8)+4]
           |      WHEN 6 THEN f[8*(i//8)+3] - f[8*(i//8)+6]
           |      ELSE f[8*(i//8)+1] - f[8*(i//8)+8]
           |      END) AS g
           |  FROM eb),
           |ca AS (SELECT id, k,
           |    list_transform(range(0, 64), i -> CASE i // 8
           |      WHEN 0 THEN g[i%8+1] + g[32+i%8+1]
           |      WHEN 1 THEN -g[24+i%8+1] + g[40+i%8+1] - g[56+i%8+1]
           |                  - CAST(floor(g[56+i%8+1] / 2.0) AS BIGINT)
           |      WHEN 2 THEN g[i%8+1] - g[32+i%8+1]
           |      WHEN 3 THEN g[8+i%8+1] + g[56+i%8+1] - g[24+i%8+1]
           |                  - CAST(floor(g[24+i%8+1] / 2.0) AS BIGINT)
           |      WHEN 4 THEN CAST(floor(g[16+i%8+1] / 2.0) AS BIGINT) - g[48+i%8+1]
           |      WHEN 5 THEN -g[8+i%8+1] + g[56+i%8+1] + g[40+i%8+1]
           |                  + CAST(floor(g[40+i%8+1] / 2.0) AS BIGINT)
           |      WHEN 6 THEN g[16+i%8+1] + CAST(floor(g[48+i%8+1] / 2.0) AS BIGINT)
           |      ELSE g[24+i%8+1] + g[40+i%8+1] + g[8+i%8+1]
           |                  + CAST(floor(g[8+i%8+1] / 2.0) AS BIGINT)
           |      END) AS e2
           |  FROM ec),
           |cb2 AS (SELECT id, k,
           |    list_transform(range(0, 64), i -> CASE i // 8
           |      WHEN 0 THEN e2[i%8+1] + e2[48+i%8+1]
           |      WHEN 1 THEN e2[8+i%8+1] + CAST(floor(e2[56+i%8+1] / 4.0) AS BIGINT)
           |      WHEN 2 THEN e2[16+i%8+1] + e2[32+i%8+1]
           |      WHEN 3 THEN e2[24+i%8+1] + CAST(floor(e2[40+i%8+1] / 4.0) AS BIGINT)
           |      WHEN 4 THEN e2[16+i%8+1] - e2[32+i%8+1]
           |      WHEN 5 THEN CAST(floor(e2[24+i%8+1] / 4.0) AS BIGINT) - e2[40+i%8+1]
           |      WHEN 6 THEN e2[i%8+1] - e2[48+i%8+1]
           |      ELSE e2[56+i%8+1] - CAST(floor(e2[8+i%8+1] / 4.0) AS BIGINT)
           |      END) AS f2
           |  FROM ca),
           |res8 AS (SELECT id, k,
           |    list_transform(range(0, 64), i ->
           |      CAST(floor(((CASE i // 8
           |        WHEN 0 THEN f2[i%8+1] + f2[56+i%8+1]
           |        WHEN 1 THEN f2[16+i%8+1] + f2[40+i%8+1]
           |        WHEN 2 THEN f2[32+i%8+1] + f2[24+i%8+1]
           |        WHEN 3 THEN f2[48+i%8+1] + f2[8+i%8+1]
           |        WHEN 4 THEN f2[48+i%8+1] - f2[8+i%8+1]
           |        WHEN 5 THEN f2[32+i%8+1] - f2[24+i%8+1]
           |        WHEN 6 THEN f2[16+i%8+1] - f2[40+i%8+1]
           |        ELSE f2[i%8+1] - f2[56+i%8+1]
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM cb2),
           |walk AS (
           |  SELECT id, 0 AS k, list_transform(range(0, 1024), i -> 128) AS p FROM ids
           |  UNION ALL
           |  SELECT s.id, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 8 = s.gx8 AND (i // 32) // 8 = s.gy8 THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.ft[(i%32)%8 + 1]
           |            WHEN 1 THEN s.fl[(i//32)%8 + 1]
           |            WHEN 2 THEN s.dcv
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%8 = 7 AND (i//32)%8 = 7
           |                THEN (s.ft[15] + 3*s.ft[16] + 2)//4
           |                ELSE (s.ft[(i%32)%8 + (i//32)%8 + 1]
           |                    + 2*s.ft[(i%32)%8 + (i//32)%8 + 2]
           |                    + s.ft[(i%32)%8 + (i//32)%8 + 3] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%8 > (i//32)%8 THEN
           |                ((CASE WHEN (i%32)%8 - (i//32)%8 = 1 THEN s.fc
           |                       ELSE s.ft[(i%32)%8 - (i//32)%8 - 1] END)
           |                 + 2*s.ft[(i%32)%8 - (i//32)%8]
           |                 + s.ft[(i%32)%8 - (i//32)%8 + 1] + 2)//4
           |              WHEN (i%32)%8 < (i//32)%8 THEN
           |                ((CASE WHEN (i//32)%8 - (i%32)%8 = 1 THEN s.fc
           |                       ELSE s.fl[(i//32)%8 - (i%32)%8 - 1] END)
           |                 + 2*s.fl[(i//32)%8 - (i%32)%8]
           |                 + s.fl[(i//32)%8 - (i%32)%8 + 1] + 2)//4
           |              ELSE (s.ft[1] + 2*s.fc + s.fl[1] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%8) - (i//32)%8 >= 0
           |                    AND (2*((i%32)%8) - (i//32)%8) % 2 = 0 THEN
           |                ((CASE WHEN (i%32)%8 - ((i//32)%8)//2 - 1 = -1 THEN s.fc
           |                       ELSE s.ft[(i%32)%8 - ((i//32)%8)//2] END)
           |                 + s.ft[(i%32)%8 - ((i//32)%8)//2 + 1] + 1)//2
           |              WHEN 2*((i%32)%8) - (i//32)%8 >= 1 THEN
           |                ((CASE WHEN (i%32)%8 - ((i//32)%8)//2 - 2 = -1 THEN s.fc
           |                       ELSE s.ft[(i%32)%8 - ((i//32)%8)//2 - 1] END)
           |                 + 2*s.ft[(i%32)%8 - ((i//32)%8)//2]
           |                 + s.ft[(i%32)%8 - ((i//32)%8)//2 + 1] + 2)//4
           |              WHEN 2*((i%32)%8) - (i//32)%8 = -1 THEN
           |                (s.fl[1] + 2*s.fc + s.ft[1] + 2)//4
           |              ELSE
           |                (s.fl[(i//32)%8 - 2*((i%32)%8)]
           |                 + 2*s.fl[(i//32)%8 - 2*((i%32)%8) - 1]
           |                 + (CASE WHEN (i//32)%8 - 2*((i%32)%8) - 3 = -1 THEN s.fc
           |                         ELSE s.fl[(i//32)%8 - 2*((i%32)%8) - 2] END) + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%8) - (i%32)%8 >= 0
           |                    AND (2*((i//32)%8) - (i%32)%8) % 2 = 0 THEN
           |                ((CASE WHEN (i//32)%8 - ((i%32)%8)//2 - 1 = -1 THEN s.fc
           |                       ELSE s.fl[(i//32)%8 - ((i%32)%8)//2] END)
           |                 + s.fl[(i//32)%8 - ((i%32)%8)//2 + 1] + 1)//2
           |              WHEN 2*((i//32)%8) - (i%32)%8 >= 1 THEN
           |                ((CASE WHEN (i//32)%8 - ((i%32)%8)//2 - 2 = -1 THEN s.fc
           |                       ELSE s.fl[(i//32)%8 - ((i%32)%8)//2 - 1] END)
           |                 + 2*s.fl[(i//32)%8 - ((i%32)%8)//2]
           |                 + s.fl[(i//32)%8 - ((i%32)%8)//2 + 1] + 2)//4
           |              WHEN 2*((i//32)%8) - (i%32)%8 = -1 THEN
           |                (s.fl[1] + 2*s.fc + s.ft[1] + 2)//4
           |              ELSE
           |                (s.ft[(i%32)%8 - 2*((i//32)%8)]
           |                 + 2*s.ft[(i%32)%8 - 2*((i//32)%8) - 1]
           |                 + (CASE WHEN (i%32)%8 - 2*((i//32)%8) - 3 = -1 THEN s.fc
           |                         ELSE s.ft[(i%32)%8 - 2*((i//32)%8) - 2] END) + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%8) % 2 = 0 THEN
           |                (s.ft[(i%32)%8 + ((i//32)%8)//2 + 1]
           |                 + s.ft[(i%32)%8 + ((i//32)%8)//2 + 2] + 1)//2
           |              ELSE (s.ft[(i%32)%8 + ((i//32)%8)//2 + 1]
           |                 + 2*s.ft[(i%32)%8 + ((i//32)%8)//2 + 2]
           |                 + s.ft[(i%32)%8 + ((i//32)%8)//2 + 3] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%8 + 2*((i//32)%8) > 13 THEN s.fl[8]
           |              WHEN (i%32)%8 + 2*((i//32)%8) = 13 THEN (s.fl[7] + 3*s.fl[8] + 2)//4
           |              WHEN ((i%32)%8 + 2*((i//32)%8)) % 2 = 0 THEN
           |                (s.fl[(i//32)%8 + ((i%32)%8)//2 + 1]
           |                 + s.fl[(i//32)%8 + ((i%32)%8)//2 + 2] + 1)//2
           |              ELSE (s.fl[(i//32)%8 + ((i%32)%8)//2 + 1]
           |                 + 2*s.fl[(i//32)%8 + ((i%32)%8)//2 + 2]
           |                 + s.fl[(i//32)%8 + ((i%32)%8)//2 + 3] + 2)//4 END
           |          END) + s.r[8*((i//32)%8) + (i%32)%8 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT v.id, v.k, v.p, v.gx8, v.gy8, v.md, v.r, v.ft, v.fl, v.fc,
           |      CASE WHEN v.hl AND v.ht THEN
           |             (list_sum(v.ft[1:8]) + list_sum(v.fl) + 8)//16
           |           WHEN v.hl THEN (list_sum(v.fl) + 4)//8
           |           WHEN v.ht THEN (list_sum(v.ft[1:8]) + 4)//8
           |           ELSE 128 END AS dcv
           |    FROM (
           |      SELECT u.id, u.k, u.p, u.gx8, u.gy8, u.md, u.r, u.hl, u.ht, u.fc,
           |        list_transform(range(0, 16), xx ->
           |          CASE WHEN NOT u.ht THEN 0
           |               WHEN xx = 0 THEN
           |                 CASE WHEN u.hc THEN (u.rt[1] + 2*u.rt[2] + u.rt[3] + 2)//4
           |                      ELSE (3*u.rt[2] + u.rt[3] + 2)//4 END
           |               WHEN xx = 15 THEN (u.rt[16] + 3*u.rt[17] + 2)//4
           |               ELSE (u.rt[xx+1] + 2*u.rt[xx+2] + u.rt[xx+3] + 2)//4 END) AS ft,
           |        list_transform(range(0, 8), yy ->
           |          CASE WHEN NOT u.hl THEN 0
           |               WHEN yy = 0 THEN
           |                 CASE WHEN u.hc THEN (u.rl[1] + 2*u.rl[2] + u.rl[3] + 2)//4
           |                      ELSE (3*u.rl[2] + u.rl[3] + 2)//4 END
           |               WHEN yy = 7 THEN (u.rl[8] + 3*u.rl[9] + 2)//4
           |               ELSE (u.rl[yy+1] + 2*u.rl[yy+2] + u.rl[yy+3] + 2)//4 END) AS fl
           |      FROM (
           |        SELECT w.id, w.k, w.p, g.gx8, g.gy8, g.md, g.hl, g.ht, g.hc, r.r,
           |          list_transform(range(-1, 16), xx ->
           |            CASE WHEN NOT g.ht THEN 0
           |                 WHEN xx = -1 THEN
           |                   (CASE WHEN g.hc THEN w.p[(8*g.gy8 - 1)*32 + 8*g.gx8] ELSE 0 END)
           |                 WHEN xx > 7 AND NOT g.htr THEN
           |                   w.p[(8*g.gy8 - 1)*32 + 8*g.gx8 + 8]
           |                 ELSE w.p[(8*g.gy8 - 1)*32 + 8*g.gx8 + xx + 1] END) AS rt,
           |          list_transform(range(-1, 8), yy ->
           |            CASE WHEN NOT g.hl THEN 0
           |                 WHEN yy = -1 THEN
           |                   (CASE WHEN g.hc THEN w.p[(8*g.gy8 - 1)*32 + 8*g.gx8] ELSE 0 END)
           |                 ELSE w.p[(8*g.gy8 + yy)*32 + 8*g.gx8] END) AS rl,
           |          -- filtered corner: hc in this geometry implies hl AND ht,
           |          -- so only the both-available §8.3.2.2.1 arm is reachable
           |          CASE WHEN g.hc THEN
           |                 (w.p[(8*g.gy8 - 1)*32 + 8*g.gx8 + 1]
           |                  + 2*w.p[(8*g.gy8 - 1)*32 + 8*g.gx8]
           |                  + w.p[(8*g.gy8)*32 + 8*g.gx8] + 2)//4
           |               ELSE 0 END AS fc
           |        FROM walk w
           |        JOIN geoq g ON g.id = w.id AND g.k = w.k
           |        JOIN res8 r ON r.id = w.id AND r.k = w.k
           |        WHERE w.k < 12
           |      ) u
           |    ) v
           |  ) s),
           |fin AS (SELECT id, p FROM walk WHERE k = 12),
           |msum AS (SELECT id, m, SUM((b + 1) * md) AS mode_sum FROM geoq GROUP BY id, m),
           |mbrows AS (
           |  SELECT f.id, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i8rows AS (
           |  SELECT r.id, r.mb, 2 AS is_i4x4, ms.mode_sum, 15 AS cbp_luma,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id),
           |mb0 AS (
           |  SELECT id, 0 AS mb, 0 AS is_i4x4, 2 AS mode_sum, 0 AS cbp_luma,
           |    qp0 AS qp, 128 * 256 AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j ->
           |      128 * ((j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    128 AS min_luma, 128 AS max_luma
           |  FROM qps)
           |SELECT id, mb::INT AS mb, is_i4x4::INT AS is_i4x4,
           |  mode_sum::BIGINT AS mode_sum, cbp_luma::INT AS cbp_luma, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i8rows)
           |ORDER BY id, mb""".stripMargin)),
    "multimodal_h264_cabac_core" -> Q(multimodalH264CabacCore, Some(
      // re-implements the §9.3.3.2 CABAC arithmetic decoding engine
      // STAGE BY STAGE in SQL (round 16, r15 VERDICT #2): context init
      // from the fixture (m, n) formula at the per-id qp, the integer
      // rangeTabLps formula, the LPS/MPS decision paths with state
      // transitions (flip-at-zero, unit MPS advance / two-step LPS
      // retreat), the shift-counted renormalization reading md5-chain
      // bits, and bypass — one recursive-CTE iteration per decoded bin,
      // every (bin, codIRange, codIOffset) triple hash-pinned.
      raw"""WITH RECURSIVE p AS (
           |  SELECT doc_id AS id, 20 + (5 * doc_id) % 32 AS qp,
           |    '42' || array_to_string(list_transform(range(0, 8), i ->
           |      md5(text || '_cabac_' || i)), '') AS hx
           |  FROM documents WHERE doc_id < 8),
           |bits AS (
           |  SELECT id, qp,
           |    list_transform(range(0, 1032), j ->
           |      ((strpos('0123456789abcdef', substr(hx, (j // 4 + 1)::INT, 1)) - 1)
           |       // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2) AS bl
           |  FROM p),
           |ini AS (
           |  SELECT id, qp, bl,
           |    -- ctx 40: m = 9, n = 50; ctx 41: m = 10, n = 57 (the
           |    -- fixture formula m = c%21-10, n = 50 + 7c%28)
           |    greatest(1, least(126, (9  * qp) // 16 + 50)) AS preA,
           |    greatest(1, least(126, (10 * qp) // 16 + 57)) AS preB
           |  FROM bits),
           |walk AS (
           |  SELECT id, bl, 0 AS k, 9 AS bp, 510 AS rng,
           |    CAST(list_sum(list_transform(range(0, 9), t -> bl[t + 1] * (1 << (8 - t)))) AS INT) AS off,
           |    CASE WHEN preA <= 63 THEN 63 - preA ELSE preA - 64 END AS sa,
           |    CASE WHEN preA <= 63 THEN 0 ELSE 1 END AS ma,
           |    CASE WHEN preB <= 63 THEN 63 - preB ELSE preB - 64 END AS sb,
           |    CASE WHEN preB <= 63 THEN 0 ELSE 1 END AS mbv,
           |    0 AS kind, 0 AS bin
           |  FROM ini
           |  UNION ALL
           |  SELECT id, bl, k + 1,
           |    CASE WHEN byp THEN bp + 1 ELSE bp + rn END,
           |    CASE WHEN byp THEN rng ELSE r3 << rn END,
           |    CASE WHEN byp THEN off2 - (CASE WHEN off2 >= rng THEN rng ELSE 0 END)
           |         ELSE (offmid << rn) + COALESCE(CAST(list_sum(list_transform(range(0, rn),
           |                t -> bl[bp + t + 1] * (1 << (rn - 1 - t)))) AS INT), 0) END,
           |    CASE WHEN byp OR k % 2 = 1 THEN sa
           |         WHEN lps THEN greatest(0, sa - 2) ELSE least(62, sa + 1) END,
           |    CASE WHEN byp OR k % 2 = 1 THEN ma
           |         WHEN lps AND sa = 0 THEN 1 - ma ELSE ma END,
           |    CASE WHEN byp OR k % 2 = 0 THEN sb
           |         WHEN lps THEN greatest(0, sb - 2) ELSE least(62, sb + 1) END,
           |    CASE WHEN byp OR k % 2 = 0 THEN mbv
           |         WHEN lps AND sb = 0 THEN 1 - mbv ELSE mbv END,
           |    CASE WHEN byp THEN 1 ELSE 0 END,
           |    CASE WHEN byp THEN (CASE WHEN off2 >= rng THEN 1 ELSE 0 END)
           |         WHEN lps THEN 1 - mps ELSE mps END
           |  FROM (
           |    SELECT *,
           |      CASE WHEN lps THEN rlps ELSE r2 END AS r3,
           |      CASE WHEN lps THEN off - r2 ELSE off END AS offmid,
           |      CASE WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 256 THEN 0
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 128 THEN 1
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 64 THEN 2
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 32 THEN 3
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 16 THEN 4
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 8 THEN 5
           |           WHEN (CASE WHEN lps THEN rlps ELSE r2 END) >= 4 THEN 6
           |           ELSE 7 END AS rn
           |    FROM (
           |      SELECT *, (rng - rlps) AS r2, off >= (rng - rlps) AS lps,
           |        (off << 1) + bl[bp + 1] AS off2
           |      FROM (
           |        SELECT *,
           |          greatest(2, ((96 + 44 * ((rng // 64) % 4)) * 256) // (256 + 20 * s)) AS rlps
           |        FROM (
           |          SELECT id, bl, k, bp, rng, off, sa, ma, sb, mbv,
           |            k % 5 = 4 AS byp,
           |            CASE WHEN k % 2 = 0 THEN sa ELSE sb END AS s,
           |            CASE WHEN k % 2 = 0 THEN ma ELSE mbv END AS mps
           |          FROM walk WHERE k < 48
           |        ) t1
           |      ) t2
           |    ) t3
           |  ) t4)
           |SELECT id, (k - 1)::INT AS step, kind::INT AS kind, bin::INT AS bin,
           |  rng::INT AS range_after, off::INT AS offset_after
           |FROM walk WHERE k >= 1 ORDER BY id, step""".stripMargin)),
    "multimodal_h264_cabac" -> Q(multimodalH264Cabac, Some(
      // restates h264CabacAssets' CABAC intra decode end to end (round
      // 16): the same recursive-plane-walk restatement as the i4x4
      // gate — mb0 a flat-128 zero-residual I16 DC MB, mbs 1..3 I4x4
      // cycling all nine §8.3.1.2 modes — with the CABAC fixture's
      // shifted constants. The SQL recomputes the DECODED result from
      // the closed-form parameters (the house codec-oracle pattern);
      // the arithmetic walk itself is pinned because any engine
      // desync corrupts every later bin and thus the pixels, and the
      // cabac_core gate restates the engine stage by stage.
      raw"""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |qps AS (SELECT id, 21 + (3*id) % 10 AS qp0,
           |  21 + (3*id) % 10 + (id+2)%5 - 2 AS qp1,
           |  21 + (3*id) % 10 + (id+2)%5 - 2 + (id+4)%5 - 2 AS qp2,
           |  21 + (3*id) % 10 + (id+2)%5 - 2 + (id+4)%5 - 2 + (id+6)%5 - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |geo AS (
           |  SELECT i.id, k.k, 1 + k.k // 16 AS m, k.k % 16 AS blk,
           |    2*((k.k % 16 // 4) % 2) + (k.k % 16 % 4) % 2 AS bx,
           |    2*((k.k % 16 // 4) // 2) + (k.k % 16 % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 48)) AS k) k),
           |geo2 AS (
           |  SELECT id, k, m, blk, 4*(m % 2) + bx AS gx, 4*(m // 2) + by AS gy,
           |    CASE WHEN m = 1 AND by = 0 THEN
           |           (CASE (id + 1 + blk) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 8 END)
           |         WHEN m = 2 AND bx = 0 THEN
           |           (CASE (id + 1 + blk) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 7 END)
           |         WHEN m = 2 THEN (id + 2 + blk) % 9
           |         ELSE (id + 1 + blk) % 9 END AS md
           |  FROM geo),
           |geoq AS (
           |  SELECT g.*,
           |    g.gy > 0 AND g.gx + 1 < 8 AND
           |      (((g.gy-1) // 4)*2 + (g.gx+1) // 4)*16
           |        + 4*(2*(((g.gy-1) % 4) // 2) + ((g.gx+1) % 4) // 2)
           |        + 2*(((g.gy-1) % 4) % 2) + ((g.gx+1) % 4) % 2
           |      < ((g.gy // 4)*2 + g.gx // 4)*16
           |        + 4*(2*((g.gy % 4) // 2) + (g.gx % 4) // 2)
           |        + 2*((g.gy % 4) % 2) + (g.gx % 4) % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id),
           |dq AS (SELECT g.id, g.k,
           |    list_transform(range(0, 16), ri ->
           |      (CASE WHEN (g.id + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 6 = 0
           |            THEN ((g.id + g.m * ((list_position(c.zz, ri) - 1) + 3) + g.blk) % 5) - 2
           |            ELSE 0 END)
           |      * c.v[g.qp % 6 + 1]
           |           [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                 WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                 ELSE 3 END]
           |      * CAST(pow(2, g.qp // 6) AS BIGINT)) AS d
           |  FROM geoq g, cst c),
           |it1 AS (SELECT id, k,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, k,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |walk AS (
           |  SELECT id, 0 AS k, list_transform(range(0, 1024), i -> 128) AS p FROM ids
           |  UNION ALL
           |  SELECT s.id, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 4 = s.gx AND (i // 32) // 4 = s.gy THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.tp[(i%32)%4 + 2]
           |            WHEN 1 THEN s.lp[(i//32)%4 + 2]
           |            WHEN 2 THEN
           |              CASE WHEN s.gx > 0 AND s.gy > 0 THEN
           |                (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+4)//8
           |              WHEN s.gx > 0 THEN (s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+2)//4
           |              WHEN s.gy > 0 THEN (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+2)//4
           |              ELSE 128 END
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%4 = 3 AND (i//32)%4 = 3
           |                THEN (s.tp[8] + 3*s.tp[9] + 2)//4
           |                ELSE (s.tp[(i%32)%4 + (i//32)%4 + 2]
           |                    + 2*s.tp[(i%32)%4 + (i//32)%4 + 3]
           |                    + s.tp[(i%32)%4 + (i//32)%4 + 4] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%4 > (i//32)%4 THEN
           |                (s.tp[(i%32)%4 - (i//32)%4] + 2*s.tp[(i%32)%4 - (i//32)%4 + 1]
           |                 + s.tp[(i%32)%4 - (i//32)%4 + 2] + 2)//4
           |              WHEN (i%32)%4 < (i//32)%4 THEN
           |                (s.lp[(i//32)%4 - (i%32)%4] + 2*s.lp[(i//32)%4 - (i%32)%4 + 1]
           |                 + s.lp[(i//32)%4 - (i%32)%4 + 2] + 2)//4
           |              ELSE (s.tp[2] + 2*s.tp[1] + s.lp[2] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%4) - (i//32)%4 >= 0
           |                    AND (2*((i%32)%4) - (i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i%32)%4) - (i//32)%4 >= 1 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2]
           |                 + 2*s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i%32)%4) - (i//32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.lp[(i//32)%4 + 1] + 2*s.lp[(i//32)%4]
           |                    + s.lp[(i//32)%4 - 1] + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%4) - (i%32)%4 >= 0
           |                    AND (2*((i//32)%4) - (i%32)%4) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i//32)%4) - (i%32)%4 >= 1 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2]
           |                 + 2*s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i//32)%4) - (i%32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.tp[(i%32)%4 + 1] + 2*s.tp[(i%32)%4]
           |                    + s.tp[(i%32)%4 - 1] + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 3] + 1)//2
           |              ELSE (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + 2*s.tp[(i%32)%4 + ((i//32)%4)//2 + 3]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 4] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%4 + 2*((i//32)%4) > 5 THEN s.lp[5]
           |              WHEN (i%32)%4 + 2*((i//32)%4) = 5 THEN (s.lp[4] + 3*s.lp[5] + 2)//4
           |              WHEN ((i%32)%4 + 2*((i//32)%4)) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 3] + 1)//2
           |              ELSE (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + 2*s.lp[(i//32)%4 + ((i%32)%4)//2 + 3]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 4] + 2)//4 END
           |          END) + s.r[4*((i//32)%4) + (i%32)%4 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT w.id, w.k, w.p, g.gx, g.gy, g.md, r.r,
           |      list_transform(range(-1, 8), xx ->
           |        CASE WHEN g.gy = 0 THEN 0
           |             WHEN xx = -1 THEN
           |               (CASE WHEN g.gx = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             WHEN xx > 3 AND NOT g.htr THEN w.p[(4*g.gy - 1)*32 + 4*g.gx + 4]
           |             ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx + xx + 1] END) AS tp,
           |      list_transform(range(-1, 4), yy ->
           |        CASE WHEN g.gx = 0 THEN 0
           |             WHEN yy = -1 THEN
           |               (CASE WHEN g.gy = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             ELSE w.p[(4*g.gy + yy)*32 + 4*g.gx] END) AS lp
           |    FROM walk w
           |    JOIN geoq g ON g.id = w.id AND g.k = w.k
           |    JOIN res4 r ON r.id = w.id AND r.k = w.k
           |    WHERE w.k < 48
           |  ) s),
           |fin AS (SELECT id, p FROM walk WHERE k = 48),
           |msum AS (SELECT id, m, SUM((blk + 1) * md) AS mode_sum FROM geoq GROUP BY id, m),
           |mbrows AS (
           |  SELECT f.id, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.mb, 1 AS is_i4x4, ms.mode_sum, 15 AS cbp_luma,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id),
           |mb0 AS (
           |  SELECT id, 0 AS mb, 0 AS is_i4x4, 2 AS mode_sum, 0 AS cbp_luma,
           |    qp0 AS qp, 128 * 256 AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j ->
           |      128 * ((j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    128 AS min_luma, 128 AS max_luma
           |  FROM qps)
           |SELECT id, mb::INT AS mb, is_i4x4::INT AS is_i4x4,
           |  mode_sum::BIGINT AS mode_sum, cbp_luma::INT AS cbp_luma, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, mb""".stripMargin)),
    "multimodal_mp4_h264" -> Q(multimodalMp4H264, Some(mp4H264OracleSql(4))),
    // MULTI-SLICE pictures (round 17): a mid-row slice boundary makes
    // the first MB of slice 1 border a DECODED-but-UNAVAILABLE
    // neighbor; the oracle's plane walk excludes the mb0 region from
    // every availability predicate. CABAC twin shares the restatement
    // (cross-coder pixel equality), differing only in the entropy
    // column and the bitstream actually decoded.
    "multimodal_h264_multislice" -> Q(multimodalH264MultiSlice,
      Some(multiSliceOracleSql(4, 0))),
    "multimodal_h264_multislice_cabac" -> Q(multimodalH264MultiSliceCabac,
      Some(multiSliceOracleSql(4, 1))),
    // MULTI-PICTURE Annex-B streams (round 17): the mp4 gates' slice
    // content as one elementary stream of two access units — the
    // shared planes CTE's sample axis IS the frame axis
    "multimodal_h264_stream" -> Q(multimodalH264Stream, Some(
      mp4H264PlanesCte(4, "range(0, 2)") + "," + raw"""
           |msum AS (SELECT id, sm, m, SUM((blk + 1) * md) AS mode_sum
           |         FROM geoq GROUP BY id, sm, m),
           |mbrows AS (
           |  SELECT f.id, f.sm, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.sm, r.mb, 1 AS is_i4x4, ms.mode_sum,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.sm = r.sm AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id AND q.sm = r.sm),
           |mb0 AS (
           |  SELECT id, sm, 0 AS mb, 0 AS is_i4x4, 2 AS mode_sum,
           |    qp0 AS qp, 128 * 256 AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j ->
           |      128 * ((j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    128 AS min_luma, 128 AS max_luma
           |  FROM qps)
           |SELECT id, sm::INT AS frame, mb::INT AS mb, 1::INT AS n_slices,
           |  is_i4x4::INT AS is_i4x4, mode_sum::BIGINT AS mode_sum, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, frame, mb""".stripMargin)),
    // STREAM-CARRIED scaling matrices (round 17): the recursive plane
    // walk with the literal §8.5.12.1 two-branch dequant — LevelScale
    // = w(i,j)·normAdjust with the REAL sub-24 rounding term — plus
    // closed-form I16 luma-DC and per-component chroma-DC restatements
    // of §8.5.10/.11 under their own weight entries
    "multimodal_h264_scaling" -> Q(multimodalH264Scaling, Some(
      raw"""WITH RECURSIVE ids AS (
           |  SELECT doc_id AS id, doc_id AS eid FROM documents WHERE doc_id < 4),
           |qps AS (SELECT id, eid,
           |  26 + (eid % 7) - 5 + ((eid+1) % 5) - 2 AS qp0,
           |  26 + (eid % 7) - 5 + ((eid+1) % 5) - 2 + ((eid+2) % 5) - 2 AS qp1,
           |  26 + (eid % 7) - 5 + ((eid+1) % 5) - 2 + ((eid+2) % 5) - 2
           |     + ((eid+3) % 5) - 2 AS qp2,
           |  26 + (eid % 7) - 5 + ((eid+1) % 5) - 2 + ((eid+2) % 5) - 2
           |     + ((eid+3) % 5) - 2 + ((eid+4) % 5) - 2 AS qp3
           | FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |geo AS (
           |  SELECT i.id, i.eid, k.k, 1 + k.k // 16 AS m, k.k % 16 AS blk,
           |    2*((k.k % 16 // 4) % 2) + (k.k % 16 % 4) % 2 AS bx,
           |    2*((k.k % 16 // 4) // 2) + (k.k % 16 % 4) // 2 AS by
           |  FROM ids i, (SELECT unnest(range(0, 48)) AS k) k),
           |geo2 AS (
           |  SELECT id, eid, k, m, blk, 4*(m % 2) + bx AS gx, 4*(m // 2) + by AS gy,
           |    CASE WHEN m = 1 AND by = 0 THEN
           |           (CASE (eid + blk) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 8 END)
           |         WHEN m = 2 AND bx = 0 THEN
           |           (CASE (eid + blk) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 7 END)
           |         WHEN m = 2 THEN (eid + 1 + blk) % 9
           |         ELSE (eid + blk) % 9 END AS md
           |  FROM geo),
           |geoq AS (
           |  SELECT g.*,
           |    g.gy > 0 AND g.gx + 1 < 8 AND
           |      (((g.gy-1) // 4)*2 + (g.gx+1) // 4)*16
           |        + 4*(2*(((g.gy-1) % 4) // 2) + ((g.gx+1) % 4) // 2)
           |        + 2*(((g.gy-1) % 4) % 2) + ((g.gx+1) % 4) % 2
           |      < ((g.gy // 4)*2 + g.gx // 4)*16
           |        + 4*(2*((g.gy % 4) // 2) + (g.gx % 4) // 2)
           |        + 2*((g.gy % 4) % 2) + (g.gx % 4) % 2 AS htr,
           |    CASE g.m WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp
           |  FROM geo2 g JOIN qps q ON q.id = g.id),
           |dq AS (SELECT g.id, g.k,
           |    -- §8.5.12.1 with LevelScale = w(i,j)·normAdjust: the
           |    -- literal two-branch formula (sub-24 rounding is real)
           |    list_transform(range(0, 16), ri ->
           |      CASE WHEN g.qp >= 24 THEN
           |        (CASE WHEN (g.eid + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 7 = 0
           |              THEN ((g.eid + g.m * ((list_position(c.zz, ri) - 1) + 2) + g.blk) % 5) - 2
           |              ELSE 0 END)
           |        * (8 + (g.eid + 3*(ri//4) + 5*(ri%4)) % 17)
           |        * c.v[g.qp % 6 + 1]
           |             [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                   WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                   ELSE 3 END]
           |        * CAST(pow(2, g.qp // 6 - 4) AS BIGINT)
           |      ELSE
           |        CAST(floor((
           |          (CASE WHEN (g.eid + g.m + g.blk + (list_position(c.zz, ri) - 1)) % 7 = 0
           |                THEN ((g.eid + g.m * ((list_position(c.zz, ri) - 1) + 2) + g.blk) % 5) - 2
           |                ELSE 0 END)
           |          * (8 + (g.eid + 3*(ri//4) + 5*(ri%4)) % 17)
           |          * c.v[g.qp % 6 + 1]
           |               [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                     WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                     ELSE 3 END]
           |          + CAST(pow(2, 3 - g.qp // 6) AS BIGINT)
           |        ) / pow(2, 4 - g.qp // 6)) AS BIGINT)
           |      END) AS d
           |  FROM geoq g, cst c),
           |it1 AS (SELECT id, k,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, k,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |mb0v AS (SELECT q.id, q.eid, q.qp0,
           |    greatest(0, least(255, 128 +
           |      (((3 + q.eid % 4) * (8 + q.eid % 17) * c.v[q.qp0 % 6 + 1][1]
           |         + CAST(pow(2, 5 - q.qp0 // 6) AS BIGINT))
           |        // CAST(pow(2, 6 - q.qp0 // 6) AS BIGINT) + 32) // 64)) AS l0,
           |    greatest(0, least(255, 128 +
           |      (((2 + q.eid % 3) * (9 + q.eid % 13) * c.v[q.qp0 % 6 + 1][1]
           |         * CAST(pow(2, q.qp0 // 6) AS BIGINT)) // 32 + 32) // 64)) AS c0b,
           |    greatest(0, least(255, 128 +
           |      (((1 + q.eid % 4) * (10 + q.eid % 11) * c.v[q.qp0 % 6 + 1][1]
           |         * CAST(pow(2, q.qp0 // 6) AS BIGINT)) // 32 + 32) // 64)) AS c0r
           |  FROM qps q, cst c),
           |walk AS (
           |  -- initial plane: mb0 is already reconstructed FLAT at l0
           |  -- (the walk covers mbs 1..3, whose predictions read mb0's
           |  -- edge pixels)
           |  SELECT v.id, 0 AS k, list_transform(range(0, 1024), i ->
           |    CASE WHEN (i % 32) < 16 AND (i // 32) < 16 THEN v.l0
           |         ELSE 128 END) AS p
           |  FROM mb0v v
           |  UNION ALL
           |  SELECT s.id, s.k + 1,
           |    list_transform(range(0, 1024), i ->
           |      CASE WHEN (i % 32) // 4 = s.gx AND (i // 32) // 4 = s.gy THEN
           |        greatest(0, least(255,
           |          (CASE s.md
           |            WHEN 0 THEN s.tp[(i%32)%4 + 2]
           |            WHEN 1 THEN s.lp[(i//32)%4 + 2]
           |            WHEN 2 THEN
           |              CASE WHEN s.gx > 0 AND s.gy > 0 THEN
           |                (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+4)//8
           |              WHEN s.gx > 0 THEN (s.lp[2]+s.lp[3]+s.lp[4]+s.lp[5]+2)//4
           |              WHEN s.gy > 0 THEN (s.tp[2]+s.tp[3]+s.tp[4]+s.tp[5]+2)//4
           |              ELSE 128 END
           |            WHEN 3 THEN
           |              CASE WHEN (i%32)%4 = 3 AND (i//32)%4 = 3
           |                THEN (s.tp[8] + 3*s.tp[9] + 2)//4
           |                ELSE (s.tp[(i%32)%4 + (i//32)%4 + 2]
           |                    + 2*s.tp[(i%32)%4 + (i//32)%4 + 3]
           |                    + s.tp[(i%32)%4 + (i//32)%4 + 4] + 2)//4 END
           |            WHEN 4 THEN
           |              CASE WHEN (i%32)%4 > (i//32)%4 THEN
           |                (s.tp[(i%32)%4 - (i//32)%4] + 2*s.tp[(i%32)%4 - (i//32)%4 + 1]
           |                 + s.tp[(i%32)%4 - (i//32)%4 + 2] + 2)//4
           |              WHEN (i%32)%4 < (i//32)%4 THEN
           |                (s.lp[(i//32)%4 - (i%32)%4] + 2*s.lp[(i//32)%4 - (i%32)%4 + 1]
           |                 + s.lp[(i//32)%4 - (i%32)%4 + 2] + 2)//4
           |              ELSE (s.tp[2] + 2*s.tp[1] + s.lp[2] + 2)//4 END
           |            WHEN 5 THEN
           |              CASE WHEN 2*((i%32)%4) - (i//32)%4 >= 0
           |                    AND (2*((i%32)%4) - (i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i%32)%4) - (i//32)%4 >= 1 THEN
           |                (s.tp[(i%32)%4 - ((i//32)%4)//2]
           |                 + 2*s.tp[(i%32)%4 - ((i//32)%4)//2 + 1]
           |                 + s.tp[(i%32)%4 - ((i//32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i%32)%4) - (i//32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.lp[(i//32)%4 + 1] + 2*s.lp[(i//32)%4]
           |                    + s.lp[(i//32)%4 - 1] + 2)//4 END
           |            WHEN 6 THEN
           |              CASE WHEN 2*((i//32)%4) - (i%32)%4 >= 0
           |                    AND (2*((i//32)%4) - (i%32)%4) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 1)//2
           |              WHEN 2*((i//32)%4) - (i%32)%4 >= 1 THEN
           |                (s.lp[(i//32)%4 - ((i%32)%4)//2]
           |                 + 2*s.lp[(i//32)%4 - ((i%32)%4)//2 + 1]
           |                 + s.lp[(i//32)%4 - ((i%32)%4)//2 + 2] + 2)//4
           |              WHEN 2*((i//32)%4) - (i%32)%4 = -1 THEN
           |                (s.lp[2] + 2*s.tp[1] + s.tp[2] + 2)//4
           |              ELSE (s.tp[(i%32)%4 + 1] + 2*s.tp[(i%32)%4]
           |                    + s.tp[(i%32)%4 - 1] + 2)//4 END
           |            WHEN 7 THEN
           |              CASE WHEN ((i//32)%4) % 2 = 0 THEN
           |                (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 3] + 1)//2
           |              ELSE (s.tp[(i%32)%4 + ((i//32)%4)//2 + 2]
           |                 + 2*s.tp[(i%32)%4 + ((i//32)%4)//2 + 3]
           |                 + s.tp[(i%32)%4 + ((i//32)%4)//2 + 4] + 2)//4 END
           |            ELSE
           |              CASE WHEN (i%32)%4 + 2*((i//32)%4) > 5 THEN s.lp[5]
           |              WHEN (i%32)%4 + 2*((i//32)%4) = 5 THEN (s.lp[4] + 3*s.lp[5] + 2)//4
           |              WHEN ((i%32)%4 + 2*((i//32)%4)) % 2 = 0 THEN
           |                (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 3] + 1)//2
           |              ELSE (s.lp[(i//32)%4 + ((i%32)%4)//2 + 2]
           |                 + 2*s.lp[(i//32)%4 + ((i%32)%4)//2 + 3]
           |                 + s.lp[(i//32)%4 + ((i%32)%4)//2 + 4] + 2)//4 END
           |          END) + s.r[4*((i//32)%4) + (i%32)%4 + 1]))
           |      ELSE s.p[i+1] END)
           |  FROM (
           |    SELECT w.id, w.k, w.p, g.gx, g.gy, g.md, r.r,
           |      list_transform(range(-1, 8), xx ->
           |        CASE WHEN g.gy = 0 THEN 0
           |             WHEN xx = -1 THEN
           |               (CASE WHEN g.gx = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             WHEN xx > 3 AND NOT g.htr THEN w.p[(4*g.gy - 1)*32 + 4*g.gx + 4]
           |             ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx + xx + 1] END) AS tp,
           |      list_transform(range(-1, 4), yy ->
           |        CASE WHEN g.gx = 0 THEN 0
           |             WHEN yy = -1 THEN
           |               (CASE WHEN g.gy = 0 THEN 0
           |                     ELSE w.p[(4*g.gy - 1)*32 + 4*g.gx] END)
           |             ELSE w.p[(4*g.gy + yy)*32 + 4*g.gx] END) AS lp
           |    FROM walk w
           |    JOIN geoq g ON g.id = w.id AND g.k = w.k
           |    JOIN res4 r ON r.id = w.id AND r.k = w.k
           |    WHERE w.k < 48
           |  ) s),
           |fin AS (SELECT id, p FROM walk WHERE k = 48),
           |mb0 AS (SELECT v.id, 0 AS mb, 0 AS is_i4x4,
           |    CAST(2 AS BIGINT) AS mode_sum, v.qp0 AS qp,
           |    v.l0 * 256 AS sum_luma,
           |    v.l0 * (SELECT list_sum(list_transform(range(0, 256), j ->
           |      (j // 16) * 32 + j % 16 + 1))) AS wsum_luma,
           |    v.l0 AS min_luma, v.l0 AS max_luma,
           |    v.c0b * 64 AS sum_cb, v.c0r * 64 AS sum_cr
           |  FROM mb0v v),
           |msum AS (SELECT id, m, SUM((blk + 1) * md) AS mode_sum
           |         FROM geoq GROUP BY id, m),
           |mbrows AS (
           |  SELECT f.id, mm.m AS mb,
           |    list_transform(range(0, 256), j ->
           |      f.p[(16*(mm.m // 2) + j // 16) * 32 + 16*(mm.m % 2) + j % 16 + 1]) AS px
           |  FROM fin f, (SELECT unnest(range(1, 4)) AS m) mm),
           |i4rows AS (
           |  SELECT r.id, r.mb, 1 AS is_i4x4, ms.mode_sum,
           |    CASE r.mb WHEN 1 THEN q.qp1 WHEN 2 THEN q.qp2 ELSE q.qp3 END AS qp,
           |    list_sum(r.px) AS sum_luma,
           |    list_sum(list_transform(range(0, 256), j -> r.px[j+1] *
           |      ((16*(r.mb // 2) + j // 16) * 32 + 16*(r.mb % 2) + j % 16 + 1))) AS wsum_luma,
           |    list_aggregate(r.px, 'min') AS min_luma,
           |    list_aggregate(r.px, 'max') AS max_luma,
           |    v.c0b * 64 AS sum_cb, v.c0r * 64 AS sum_cr
           |  FROM mbrows r JOIN msum ms ON ms.id = r.id AND ms.m = r.mb
           |  JOIN qps q ON q.id = r.id JOIN mb0v v ON v.id = r.id)
           |SELECT id, mb::INT AS mb, is_i4x4::INT AS is_i4x4,
           |  mode_sum::BIGINT AS mode_sum, qp::INT AS qp,
           |  sum_luma::BIGINT AS sum_luma, wsum_luma::BIGINT AS wsum_luma,
           |  min_luma::INT AS min_luma, max_luma::INT AS max_luma,
           |  sum_cb::BIGINT AS sum_cb, sum_cr::BIGINT AS sum_cr
           |FROM (SELECT * FROM mb0 UNION ALL SELECT * FROM i4rows)
           |ORDER BY id, mb""".stripMargin)),
    // stts decode timestamps (round 17): cumulative formula deltas +
    // the stss sync flags, integer-exact
    "multimodal_mp4_timestamps" -> Q(multimodalMp4Timestamps, Some(
      raw"""SELECT d.doc_id AS id, s.s::INT AS sample,
           |  CAST(COALESCE(list_sum(list_transform(range(0, s.s), k ->
           |    1 + (d.doc_id + k) % 7)), 0) AS BIGINT) AS dts,
           |  (CASE WHEN s.s % 2 = 0 THEN 1 ELSE 0 END)::INT AS is_sync,
           |  1000::BIGINT AS timescale
           |FROM documents d, (SELECT unnest(range(0, 4)) AS s) s
           |WHERE d.doc_id < 4 ORDER BY id, sample""".stripMargin)),
    // ctts composition offsets (round 17): PTS = DTS + signed v1
    // offset, closed-form over the same formula fixtures
    "multimodal_mp4_ctts" -> Q(multimodalMp4Ctts, Some(
      raw"""SELECT d.doc_id AS id, s.s::INT AS sample,
           |  CAST(COALESCE(list_sum(list_transform(range(0, s.s), k ->
           |    1 + (d.doc_id + k) % 7)), 0) AS BIGINT) AS dts,
           |  CAST(COALESCE(list_sum(list_transform(range(0, s.s), k ->
           |    1 + (d.doc_id + k) % 7)), 0)
           |    + ((d.doc_id + 2 * s.s) % 5 - 2) AS BIGINT) AS pts
           |FROM documents d, (SELECT unnest(range(0, 4)) AS s) s
           |WHERE d.doc_id < 4 ORDER BY id, sample""".stripMargin)),
    // stss keyframe extraction (round 17): four samples, sync = {1, 3}
    // 1-based → only sm 0 and 2 decode; the same content restatement
    // as mp4_h264 over the sync sm values alone. Non-sync samples are
    // undecodable P slices, so ANY attempted decode of them throws.
    "multimodal_mp4_keyframes" -> Q(multimodalMp4Keyframes,
      Some(mp4H264OracleSql(4, "[0, 2]"))),
    "multimodal_mp4_chunks_h264" -> Q(multimodalMp4ChunksH264, Some(mp4H264OracleSql(4))),
    "multimodal_mp4_chunks_aac" -> Q(multimodalMp4ChunksAac, Some(mp4AacOracleSql(4))),
    // fragmented MP4 (round 17): moof/tfhd/trun delivery of the SAME
    // content as the chunked gates — oracles reused verbatim; the
    // gates pin the fragment walk alone
    "multimodal_mp4_frag_h264" -> Q(multimodalMp4FragH264, Some(mp4H264OracleSql(4))),
    "multimodal_mp4_frag_aac" -> Q(multimodalMp4FragAac, Some(mp4AacOracleSql(4))),
    // GAPLESS trim (round 17): the elst edit window [D, D+L) applied
    // to the decoded PCM — the oracle reuses the AAC PCM restatement
    // filtered to the window, weights re-based to the trimmed index
    "multimodal_mp4_gapless" -> Q(multimodalMp4Gapless, Some(
      s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |fs AS (SELECT unnest(range(0, 2)) AS f),
           |par AS (SELECT id, f, 96 + (id + 5*f) % 8 AS gg FROM ids, fs),
           |co AS (SELECT p.id, p.f, d.i,
           |         CASE WHEN d.i >= 256 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i + p.f) % 5 < 2 THEN -1 ELSE 1 END)
           |           * ((p.id + d.i + 7*p.f) % 3) END AS q,
           |         p.gg + (p.id + 3*(d.i // 32) + p.f) % 9 - 4 AS sf
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d),
           |nz AS (SELECT id, f, list(struct_pack(k := i,
           |           v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100)))
           |         ORDER BY i) AS l
           |       FROM co WHERE q != 0 GROUP BY id, f),
           |zz AS (SELECT z.id, z.f, d.n,
           |         sin(pi()/2048.0 * (d.n + 0.5)) *
           |         (list_sum(list_transform(z.l, s ->
           |            s.v * cos(pi()/1024.0 * (d.n + 512.5) * (s.k + 0.5)))) / 1024.0) AS z
           |       FROM nz z, (SELECT unnest(range(0, 2048)) AS n) d),
           |pcm AS (SELECT a.id, a.f, a.n,
           |          greatest(-32768, least(32767, CAST(floor(
           |            (a.z + COALESCE(b.z, 0.0)) * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM zz a LEFT JOIN zz b
           |          ON b.id = a.id AND b.f = a.f - 1 AND b.n = a.n + 1024
           |        WHERE a.n < 1024),
           |trim AS (SELECT id, 64 + (id * 37) % 256 AS d,
           |           2048 - (64 + (id * 37) % 256) - (id * 29) % 200 AS l
           |         FROM ids)
           |SELECT p.id, 0::INT AS channel,
           |  ((p.id + 1) * 10)::BIGINT AS delay_ts,
           |  t.d::BIGINT AS media_time, t.l::INT AS n_samples,
           |  CAST(sum(p.p) AS BIGINT) AS sum_pcm,
           |  CAST(sum(abs(p.p)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(p.p * (p.f * 1024 + p.n - t.d + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm p JOIN trim t ON t.id = p.id
           |WHERE p.f * 1024 + p.n >= t.d AND p.f * 1024 + p.n < t.d + t.l
           |GROUP BY p.id, t.d, t.l ORDER BY p.id""".stripMargin)),
    // fragmented timestamps (round 17): video DTS = tfdt anchor (frag
    // 0) then continuation (frag 1), PTS = DTS + signed cts; audio
    // pins the trex default-duration (0) path
    "multimodal_mp4_frag_timestamps" -> Q(multimodalMp4FragTimestamps, Some(
      raw"""SELECT d.doc_id AS id, t.t::BIGINT AS trk, s.s::INT AS sample,
           |  CAST(CASE WHEN t.t = 2 THEN 0
           |    WHEN s.s = 0 THEN d.doc_id
           |    ELSE d.doc_id + 10 + (d.doc_id % 3) END AS BIGINT) AS dts,
           |  CAST(CASE WHEN t.t = 2 THEN 0
           |    WHEN s.s = 0 THEN d.doc_id + (d.doc_id % 3) - 1
           |    ELSE d.doc_id + 10 + (d.doc_id % 3)
           |      + ((d.doc_id + 1) % 3) - 1 END AS BIGINT) AS pts
           |FROM documents d, (SELECT unnest(range(1, 3)) AS t) t,
           |  (SELECT unnest(range(0, 2)) AS s) s
           |WHERE d.doc_id < 4 ORDER BY id, trk, sample""".stripMargin)),
    // end-to-end media pipeline (round 17): container → stss keyframes
    // → intra decode → pooled-luma embedding → dot-product top-1. The
    // oracle reuses the keyframe gate's full recursive PLANE
    // restatement, pools it, and re-ranks all pairs — so a defect
    // anywhere in the composed pipeline (walk, sync filter, decode,
    // pooling, scoring, tie-break) reddens the gate.
    "media_pipeline_knn" -> Q(mediaPipelineKnn, Some(
      mp4H264PlanesCte(4, "[0, 2]") + "," + raw"""
           |emb AS (SELECT id, sm, list_transform(range(0, 16), e ->
           |    list_sum(list_transform(range(0, 64), j ->
           |      p[((e//4)*8 + (j//8))*32 + (e%4)*8 + (j%8) + 1]))) AS v
           |  FROM fin),
           |pairs AS (
           |  SELECT a.id AS id, a.sm AS sample, b.id AS n_id, b.sm AS n_sample,
           |    list_sum(list_transform(range(0, 16), t -> a.v[t+1] * b.v[t+1])) AS dot
           |  FROM emb a, emb b
           |  WHERE NOT (a.id = b.id AND a.sm = b.sm)),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY id, sample
           |         ORDER BY dot DESC, n_id, n_sample) AS rn FROM pairs)
           |SELECT id, sample::INT AS sample, n_id, n_sample::INT AS n_sample,
           |  dot::BIGINT AS dot
           |FROM rk WHERE rn = 1 ORDER BY id, sample""".stripMargin)),
    "multimodal_mp4_aac" -> Q(multimodalMp4Aac, Some(mp4AacOracleSql(6))),
    "multimodal_h264_i16_chroma" -> Q(multimodalH264I16Chroma, Some(
      // restates h264ChromaAssets' CHROMA decode end to end (late round
      // 15): the §8.5.8 QPC mapping (incl. the table region), the 2x2
      // DC Hadamard with its ((f·16·v0) << qpc/6) >> 5 scaling (floor
      // division — arithmetic shift on negatives), AC dequant + the 4x4
      // inverse core transform, and the STAGED §8.3.4 prediction chain
      // (mb0 DC-no-neighbors 128, mb1 Horizontal, mb2 Vertical, mb3
      // Plane incl. the top-left corner) per component. All integers.
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 4),
           |par AS (SELECT id, CASE WHEN 22 + 3*id + 2 < 30 THEN 22 + 3*id + 2
           |          ELSE ([29,30,31,32,32,33,34,34,35,35,36,36,37,37,37,38,38,38,39,39,39,39])[22 + 3*id + 2 - 30 + 1]
           |          END AS qpc FROM ids),
           |cst AS (SELECT
           |  [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15] AS zz,
           |  [[10,16,13],[11,18,14],[13,20,16],[14,23,18],[16,25,20],[18,29,23]] AS v),
           |mbs AS (SELECT unnest(range(0, 4)) AS mb),
           |cms AS (SELECT unnest(range(0, 2)) AS c),
           |blks AS (SELECT unnest(range(0, 4)) AS blk),
           |dcr AS (SELECT p.id, m.mb, c.c, p.qpc,
           |    list_transform(range(0, 4), k ->
           |      CASE WHEN (p.id + m.mb + c.c + k) % 3 = 0
           |           THEN ((p.id + m.mb + c.c + k) % 5) - 2 ELSE 0 END) AS d
           |  FROM par p, mbs m, cms c),
           |dcv AS (SELECT h.id, h.mb, h.c, h.qpc,
           |    list_transform(
           |      [h.d[1]+h.d[2]+h.d[3]+h.d[4], h.d[1]-h.d[2]+h.d[3]-h.d[4],
           |       h.d[1]+h.d[2]-h.d[3]-h.d[4], h.d[1]-h.d[2]-h.d[3]+h.d[4]],
           |      f -> CAST(floor((f * 16 * cs.v[h.qpc % 6 + 1][1]
           |             * pow(2, h.qpc // 6)) / 32.0) AS BIGINT)) AS dc
           |  FROM dcr h, cst cs),
           |dq AS (SELECT d.id, d.mb, d.c, b.blk,
           |    list_transform(range(0, 16), ri -> CASE WHEN ri = 0 THEN d.dc[b.blk + 1]
           |      ELSE
           |        (CASE WHEN (d.id + d.mb + d.c + b.blk + (list_position(cs.zz, ri) - 2)) % 6 = 0
           |              THEN ((d.id + b.blk * (list_position(cs.zz, ri) - 1) + d.c + d.mb) % 5) - 2
           |              ELSE 0 END)
           |        * cs.v[d.qpc % 6 + 1]
           |             [CASE WHEN (ri//4) % 2 = 0 AND (ri%4) % 2 = 0 THEN 1
           |                   WHEN (ri//4) % 2 = 1 AND (ri%4) % 2 = 1 THEN 2
           |                   ELSE 3 END]
           |        * CAST(pow(2, d.qpc // 6) AS BIGINT)
           |      END) AS d
           |  FROM dcv d, blks b, cst cs),
           |it1 AS (SELECT id, mb, c, blk,
           |    list_transform(range(0, 16), i -> CASE i % 4
           |      WHEN 0 THEN (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                + (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      WHEN 1 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                + (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      WHEN 2 THEN (d[4*(i//4)+1] - d[4*(i//4)+3])
           |                - (CAST(floor(d[4*(i//4)+2] / 2.0) AS BIGINT) - d[4*(i//4)+4])
           |      ELSE (d[4*(i//4)+1] + d[4*(i//4)+3])
           |                - (d[4*(i//4)+2] + CAST(floor(d[4*(i//4)+4] / 2.0) AS BIGINT))
           |      END) AS h
           |  FROM dq),
           |res4 AS (SELECT id, mb, c, blk,
           |    list_transform(range(0, 16), i ->
           |      CAST(floor(((CASE i // 4
           |        WHEN 0 THEN (h[i%4+1] + h[i%4+9])
           |                  + (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        WHEN 1 THEN (h[i%4+1] - h[i%4+9])
           |                  + (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        WHEN 2 THEN (h[i%4+1] - h[i%4+9])
           |                  - (CAST(floor(h[i%4+5] / 2.0) AS BIGINT) - h[i%4+13])
           |        ELSE (h[i%4+1] + h[i%4+9])
           |                  - (h[i%4+5] + CAST(floor(h[i%4+13] / 2.0) AS BIGINT))
           |        END) + 32) / 64.0) AS BIGINT)) AS r
           |  FROM it1),
           |resm AS (SELECT id, mb, c, list(r ORDER BY blk) AS rl
           |         FROM res4 GROUP BY id, mb, c),
           |r8 AS (SELECT id, mb, c,
           |    list_transform(range(0, 64), i ->
           |      rl[((i//8)//4)*2 + ((i%8)//4) + 1][4*((i//8)%4) + (i%8)%4 + 1]) AS r
           |  FROM resm),
           |rec0 AS (SELECT id, c, list_transform(range(0, 64), i ->
           |    greatest(0, least(255, 128 + r[i+1]))) AS p FROM r8 WHERE mb = 0),
           |rec1 AS (SELECT a.id, a.c, list_transform(range(0, 64), i ->
           |    greatest(0, least(255, b.p[(i//8)*8 + 8] + a.r[i+1]))) AS p
           |  FROM r8 a JOIN rec0 b ON a.id = b.id AND a.c = b.c WHERE a.mb = 1),
           |rec2 AS (SELECT a.id, a.c, list_transform(range(0, 64), i ->
           |    greatest(0, least(255, b.p[57 + i%8] + a.r[i+1]))) AS p
           |  FROM r8 a JOIN rec0 b ON a.id = b.id AND a.c = b.c WHERE a.mb = 2),
           |pl AS (SELECT r1.id, r1.c,
           |    list_sum(list_transform(range(0, 4), k ->
           |      (k+1) * (r1.p[61 + k] -
           |        CASE WHEN k = 3 THEN r0.p[64] ELSE r1.p[59 - k] END))) AS hsum,
           |    list_sum(list_transform(range(0, 4), k ->
           |      (k+1) * (r2.p[(4+k)*8 + 8] -
           |        CASE WHEN k = 3 THEN r0.p[64] ELSE r2.p[(2-k)*8 + 8] END))) AS vsum,
           |    16 * (r2.p[64] + r1.p[64]) AS pa
           |  FROM rec1 r1 JOIN rec2 r2 ON r1.id = r2.id AND r1.c = r2.c
           |  JOIN rec0 r0 ON r0.id = r1.id AND r0.c = r1.c),
           |rec3 AS (SELECT a.id, a.c, list_transform(range(0, 64), i ->
           |    greatest(0, least(255,
           |      greatest(0, least(255, CAST(floor((pl.pa
           |        + CAST(floor((17 * pl.hsum + 16) / 32.0) AS BIGINT) * (i%8 - 3)
           |        + CAST(floor((17 * pl.vsum + 16) / 32.0) AS BIGINT) * (i//8 - 3)
           |        + 16) / 32.0) AS BIGINT)))
           |      + a.r[i+1]))) AS p
           |  FROM r8 a JOIN pl ON a.id = pl.id AND a.c = pl.c WHERE a.mb = 3),
           |recs AS (
           |  SELECT id, 0 AS mb, c, p FROM rec0 UNION ALL
           |  SELECT id, 1, c, p FROM rec1 UNION ALL
           |  SELECT id, 2, c, p FROM rec2 UNION ALL
           |  SELECT id, 3, c, p FROM rec3),
           |agg AS (SELECT r.id, r.mb, r.c,
           |    CAST(list_sum(r.p) AS BIGINT) AS s,
           |    CAST(list_sum(list_transform(range(0, 64), i -> r.p[i+1] *
           |      ((8*(r.mb//2) + i//8) * 16 + 8*(r.mb%2) + i%8 + 1))) AS BIGINT) AS ws,
           |    list_aggregate(r.p, 'min') AS mn, list_aggregate(r.p, 'max') AS mx
           |  FROM recs r)
           |SELECT b.id, b.mb::INT AS mb, b.mb::INT AS chroma_pred_mode,
           |  2::INT AS cbp_chroma, p2.qpc::INT AS qpc,
           |  b.s AS sum_cb, b.ws AS wsum_cb, r.s AS sum_cr, r.ws AS wsum_cr,
           |  least(b.mn, r.mn)::INT AS min_c, greatest(b.mx, r.mx)::INT AS max_c
           |FROM agg b JOIN agg r ON r.id = b.id AND r.mb = b.mb AND r.c = 1
           |JOIN par p2 ON p2.id = b.id
           |WHERE b.c = 0
           |ORDER BY b.id, b.mb""".stripMargin)),
    "multimodal_h264_sps" -> Q(multimodalH264Sps, Some(
      // restates h264Assets' SPS/PPS field formulas + the §7.4.2.1.1
      // width/height derivation, and pins the concatenated slice RBSPs
      // (emulation-prevention prefix + chain bytes + 0x80 stop) in hex
      // space — so start-code walk, EBSP→RBSP unescape and Exp-Golomb
      // header decode are all oracle-checked
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_h264_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |f AS (SELECT id, hx,
        |        (1 + id % 3)::INT AS n_slices,
        |        (8 + id % 5)::INT AS slen,
        |        (1 + id % 8)::INT AS pw,
        |        (1 + id % 6)::INT AS ph,
        |        (CASE WHEN id % 4 <> 3 THEN 1 ELSE 2 END) AS fld,
        |        (CASE WHEN id % 2 = 0 THEN id % 3 ELSE 0 END) AS cr,
        |        (CASE WHEN id % 2 = 0 THEN (id // 2) % 2 ELSE 0 END) AS cb
        |      FROM p)
        |SELECT id,
        |       (2 + n_slices)::INT AS n_nals,
        |       n_slices,
        |       (CASE id % 3 WHEN 0 THEN 66 WHEN 1 THEN 77 ELSE 100 END)::INT AS profile_idc,
        |       (CASE id % 5 WHEN 0 THEN 30 WHEN 1 THEN 31 WHEN 2 THEN 40 WHEN 3 THEN 41 ELSE 51 END)::INT AS level_idc,
        |       (pw * 16 - 2 * cr)::INT AS width,
        |       (fld * ph * 16 - 2 * fld * cb)::INT AS height,
        |       (4 + id % 8)::INT AS log2_max_frame_num,
        |       (2 * (id % 2))::INT AS poc_type,
        |       (id % 5)::INT AS max_ref_frames,
        |       (id % 2)::INT AS entropy_cabac,
        |       md5(array_to_string(list_transform(range(0, n_slices), s ->
        |         '000001000002' || substr(hx, 1 + s * slen * 2, slen * 2) || '80'), '')) AS slice_fp
        |FROM f ORDER BY id""".stripMargin)),
    "multimodal_aac_adts" -> Q(multimodalAacAdts, Some(
      // restates aacAssets' header formulas (profile/rate/channels/frame
      // count), the 1024-samples-per-block duration and the concatenated
      // raw_data_block fingerprint — the variable header length (CRC
      // present every 4th id) is pinned because a misplaced payload start
      // shifts the hex substring
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_aac_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |f AS (SELECT id, hx, (2 + id % 3)::INT AS n_frames, (16 + id % 7)::INT AS plen,
        |        (CASE id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100 ELSE 32000 END)::INT AS rate
        |      FROM p)
        |SELECT id, n_frames, (id % 2)::INT AS profile, rate AS sample_rate,
        |       (1 + id % 2)::INT AS channels,
        |       (n_frames * 1024 * 1000) // rate AS duration_ms,
        |       md5(substr(hx, 1, n_frames * plen * 2)) AS payload_fp
        |FROM f ORDER BY id""".stripMargin)),
    "multimodal_aac_spectra" -> Q(multimodalAacSpectra, Some(
      // restates aacSceAssets' SCE decode end to end: the per-(id, i)
      // quantized-integer formula over the coded uniform-32 bands, the
      // DPCM scalefactor chain, and the §10.3 dequantization
      // sign·|q|^(4/3)·2^(0.25·(sf−100)) — integer checksums exact, the
      // two dequantized sums under the floor-form 4-dp round (both
      // engines fold the 1024-entry list left-to-right; ~1-ulp libm pow
      // noise sits 9 orders below the grid)
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
           |par AS (SELECT id, 8 + id % 4 AS max_sfb, 96 + id % 8 AS gg FROM ids),
           |qs AS (SELECT id, max_sfb, gg,
           |  list_transform(range(0, 1024), i ->
           |    CASE WHEN i >= 32 * max_sfb OR (id + i // 32) % 3 = 0 THEN 0 ELSE
           |      (CASE WHEN (id + i) % 5 < 2 THEN -1 ELSE 1 END) * ((id + i) % 3)
           |    END) AS q
           |  FROM par),
           |xrs AS (SELECT id, max_sfb, gg, q,
           |  list_transform(range(0, 1024), i ->
           |    CASE WHEN q[i+1] = 0 THEN 0.0 ELSE
           |      sign(q[i+1]) * pow(abs(q[i+1]), 4.0/3.0) *
           |      pow(2.0, 0.25*((gg + (id + 3*(i // 32)) % 9 - 4) - 100))
           |    END) AS xr
           |  FROM qs)
           |SELECT id, gg AS global_gain, max_sfb,
           |  CAST(list_sum(list_transform(range(0, max_sfb), s ->
           |    CASE WHEN (id+s) % 3 = 0 THEN 0 ELSE 1 END)) AS BIGINT) AS n_coded_sfb,
           |  CAST(list_sum(list_transform(range(0, max_sfb), s ->
           |    CASE WHEN (id+s) % 3 = 0 THEN 0 ELSE gg + (id + 3*s) % 9 - 4 END)) AS BIGINT) AS sum_sf,
           |  len(list_filter(q, x -> x != 0)) AS n_nonzero,
           |  CAST(list_sum(q) AS BIGINT) AS sum_q,
           |  CAST(list_sum(list_transform(range(1, 1025), i -> q[i] * i)) AS BIGINT) AS wsum_q,
           |  floor(list_sum(xr) * 10000.0 + 0.5) / 10000.0 AS xr_sum,
           |  floor(list_sum(list_transform(range(1, 1025), i -> xr[i] * i)) * 10000.0 + 0.5) / 10000.0 AS xr_wsum
           |FROM xrs ORDER BY id""".stripMargin)),
    "multimodal_aac_pcm" -> Q(multimodalAacPcm, Some(
      // restates the ENTIRE AAC-LC DSP chain in SQL: dequantization, the
      // 2048-point IMDCT over the nonzero lines (ascending-k struct list
      // — the identical IEEE fold order the Scala kernel uses when it
      // skips zeros), the sine window, and the floor-based 16-bit
      // quantizer; all aggregates are over exact integers, so the ~1-ulp
      // cos/pow noise is absorbed per sample
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 8),
           |par AS (SELECT id, 8 + id % 4 AS max_sfb, 96 + id % 8 AS gg FROM ids),
           |co AS (SELECT p.id, d.i,
           |         (CASE WHEN (p.id + d.i) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i) % 3) AS q,
           |         p.gg + (p.id + 3*(d.i // 32)) % 9 - 4 AS sf
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d
           |       WHERE d.i < 32 * p.max_sfb AND (p.id + d.i // 32) % 3 != 0),
           |nz AS (SELECT id, list(struct_pack(k := i,
           |           v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100))) ORDER BY i) AS l
           |       FROM co WHERE q != 0 GROUP BY id),
           |pcm AS (SELECT z.id, d.pos,
           |          greatest(-32768, least(32767, CAST(floor(
           |            sin(pi()/2048.0 * (d.pos + 0.5)) *
           |            (list_sum(list_transform(z.l, s ->
           |               s.v * cos(pi()/1024.0 * (d.pos + 512.5) * (s.k + 0.5)))) / 1024.0)
           |            * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM nz z, (SELECT unnest(range(0, 1024)) AS pos) d)
           |SELECT id, count(*) AS n_samples,
           |  CAST(sum(CASE WHEN p = 32767 OR p = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |  CAST(sum(CASE WHEN p != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |  CAST(sum(p) AS BIGINT) AS sum_pcm, CAST(sum(abs(p)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(p * (pos + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm GROUP BY id ORDER BY id""".stripMargin)),
    "multimodal_aac_cpe" -> Q(multimodalAacCpe, Some(
      // restates aacCpeAssets' STEREO decode end to end (round 15, r14
      // VERDICT #1): both channels' transmitted-integer formulas (pins
      // the per-channel Huffman/DPCM walk), dequantization with the
      // per-channel scalefactor chains, the §12.2 MS matrix over the
      // mask-selected bands (l = m + s, r = m − s; mask cycles
      // off/per-band/all by id % 3), then the IMDCT over the union-
      // nonzero struct list, sine window and floor-form 16-bit
      // quantizer — integer aggregates absorb cross-engine libm noise
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |par AS (SELECT id, 6 + id % 3 AS max_sfb, CAST(id % 3 AS INT) AS mask,
           |               96 + id % 8 AS gg0, 96 + (id + 5) % 8 AS gg1 FROM ids),
           |co AS (SELECT p.id, p.mask, d.i,
           |         CASE WHEN (p.id + d.i // 32) % 3 = 0 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i) % 3) END AS lq,
           |         CASE WHEN (p.id + d.i // 32 + 1) % 3 = 0 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i + 1) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i + 7) % 3) END AS rq,
           |         p.gg0 + (p.id + 3*(d.i // 32)) % 9 - 4 AS sf0,
           |         p.gg1 + (p.id + 3*(d.i // 32) + 2) % 9 - 4 AS sf1,
           |         (p.mask = 2 OR (p.mask = 1 AND (p.id + d.i // 32) % 2 = 0)) AS mson
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d
           |       WHERE d.i < 32 * p.max_sfb),
           |dq AS (SELECT id, i, lq, rq, mson,
           |         CASE WHEN lq = 0 THEN 0.0 ELSE
           |           sign(lq) * pow(abs(lq), 4.0/3.0) * pow(2.0, 0.25*(sf0 - 100)) END AS lv,
           |         CASE WHEN rq = 0 THEN 0.0 ELSE
           |           sign(rq) * pow(abs(rq), 4.0/3.0) * pow(2.0, 0.25*(sf1 - 100)) END AS rv
           |       FROM co),
           |pc AS (SELECT d.id, c.ch, d.i,
           |         CASE WHEN d.mson THEN (CASE WHEN c.ch = 0 THEN d.lv + d.rv ELSE d.lv - d.rv END)
           |              ELSE (CASE WHEN c.ch = 0 THEN d.lv ELSE d.rv END) END AS v
           |       FROM dq d, (SELECT unnest(range(0, 2)) AS ch) c
           |       WHERE d.lq != 0 OR d.rq != 0),
           |nz AS (SELECT id, ch, list(struct_pack(k := i, v := v) ORDER BY i) AS l
           |       FROM pc GROUP BY id, ch),
           |pcm AS (SELECT z.id, z.ch, d.pos,
           |          greatest(-32768, least(32767, CAST(floor(
           |            sin(pi()/2048.0 * (d.pos + 0.5)) *
           |            (list_sum(list_transform(z.l, s ->
           |               s.v * cos(pi()/1024.0 * (d.pos + 512.5) * (s.k + 0.5)))) / 1024.0)
           |            * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM nz z, (SELECT unnest(range(0, 1024)) AS pos) d),
           |qagg AS (SELECT d.id, c.ch,
           |           CAST(sum(CASE WHEN (CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) != 0 THEN 1 ELSE 0 END) AS INT) AS n_nonzero_q,
           |           CAST(sum(CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) AS BIGINT) AS sum_q,
           |           CAST(sum((CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) * (d.i + 1)) AS BIGINT) AS wsum_q
           |         FROM co d, (SELECT unnest(range(0, 2)) AS ch) c
           |         GROUP BY d.id, c.ch),
           |pagg AS (SELECT id, ch, count(*) AS n_samples,
           |           CAST(sum(CASE WHEN p = 32767 OR p = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |           CAST(sum(CASE WHEN p != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |           CAST(sum(p) AS BIGINT) AS sum_pcm, CAST(sum(abs(p)) AS BIGINT) AS abs_pcm,
           |           CAST(sum(p * (pos + 1)) AS BIGINT) AS wsum_pcm
           |         FROM pcm GROUP BY id, ch)
           |SELECT q.id, q.ch AS channel, p2.mask AS ms_mask,
           |       q.n_nonzero_q, q.sum_q, q.wsum_q,
           |       a.n_samples, a.n_clipped, a.n_nonzero,
           |       a.sum_pcm, a.abs_pcm, a.wsum_pcm
           |FROM qagg q JOIN pagg a ON q.id = a.id AND q.ch = a.ch
           |JOIN par p2 ON p2.id = q.id
           |ORDER BY q.id, q.ch""".stripMargin)),
    "multimodal_aac_is" -> Q(multimodalAacIs, Some(
      // restates aacIsAssets' INTENSITY decode end to end (round 16 —
      // §4.6.8.2, the last LC stereo tool): the coded-band dequant on
      // both channels, MS on the mask-selected bands BELOW isStart,
      // and above it the intensity reconstruction r = l ·
      // 0.5^(is_position/4) · phase with cb 14 negating and ms_used
      // flipping; then the shared IMDCT/window/quantizer tail. The
      // right channel's transmitted-integer checksums pin that IS
      // bands carry NO spectral data.
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |par AS (SELECT id, 4 + id % 2 AS iss,
           |               96 + id % 8 AS gg0, 96 + (id + 5) % 8 AS gg1 FROM ids),
           |co AS (SELECT p.id, p.iss, d.i, d.i // 32 AS s,
           |         (CASE WHEN (p.id + d.i) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i) % 3) AS lq,
           |         CASE WHEN d.i // 32 >= p.iss THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i + 1) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i + 7) % 3) END AS rq,
           |         p.gg0 + (p.id + 3*(d.i // 32)) % 9 - 4 AS sf0,
           |         p.gg1 + (p.id + 3*(d.i // 32) + 2) % 9 - 4 AS sf1,
           |         (p.id + d.i // 32) % 2 = 0 AS mbit,
           |         (p.id + 2*(d.i // 32)) % 9 - 4 AS pos,
           |         (p.id + d.i // 32) % 3 != 0 AS cb15
           |       FROM par p, (SELECT unnest(range(0, 256)) AS i) d),
           |dq AS (SELECT id, iss, i, s, lq, rq, mbit, pos, cb15,
           |         CASE WHEN lq = 0 THEN 0.0 ELSE
           |           sign(lq) * pow(abs(lq), 4.0/3.0) * pow(2.0, 0.25*(sf0 - 100)) END AS lv,
           |         CASE WHEN rq = 0 THEN 0.0 ELSE
           |           sign(rq) * pow(abs(rq), 4.0/3.0) * pow(2.0, 0.25*(sf1 - 100)) END AS rv
           |       FROM co),
           |pc AS (SELECT d.id, c.ch, d.i,
           |         CASE WHEN d.s >= d.iss THEN
           |           CASE WHEN c.ch = 0 THEN d.lv
           |                ELSE d.lv * pow(0.5, 0.25 * d.pos)
           |                     * (CASE WHEN d.cb15 THEN 1.0 ELSE -1.0 END)
           |                     * (CASE WHEN d.mbit THEN -1.0 ELSE 1.0 END) END
           |         WHEN d.mbit THEN
           |           (CASE WHEN c.ch = 0 THEN d.lv + d.rv ELSE d.lv - d.rv END)
           |         ELSE (CASE WHEN c.ch = 0 THEN d.lv ELSE d.rv END) END AS v
           |       FROM dq d, (SELECT unnest(range(0, 2)) AS ch) c),
           |nz AS (SELECT id, ch, list(struct_pack(k := i, v := v) ORDER BY i) AS l
           |       FROM pc WHERE v != 0 GROUP BY id, ch),
           |pcm AS (SELECT z.id, z.ch, d.pos,
           |          greatest(-32768, least(32767, CAST(floor(
           |            sin(pi()/2048.0 * (d.pos + 0.5)) *
           |            (list_sum(list_transform(z.l, s ->
           |               s.v * cos(pi()/1024.0 * (d.pos + 512.5) * (s.k + 0.5)))) / 1024.0)
           |            * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM nz z, (SELECT unnest(range(0, 1024)) AS pos) d),
           |qagg AS (SELECT d.id, c.ch,
           |           CAST(sum(CASE WHEN (CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) != 0 THEN 1 ELSE 0 END) AS INT) AS n_nonzero_q,
           |           CAST(sum(CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) AS BIGINT) AS sum_q,
           |           CAST(sum((CASE WHEN c.ch = 0 THEN d.lq ELSE d.rq END) * (d.i + 1)) AS BIGINT) AS wsum_q
           |         FROM co d, (SELECT unnest(range(0, 2)) AS ch) c
           |         GROUP BY d.id, c.ch),
           |pagg AS (SELECT id, ch, count(*) AS n_samples,
           |           CAST(sum(CASE WHEN p = 32767 OR p = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |           CAST(sum(CASE WHEN p != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |           CAST(sum(p) AS BIGINT) AS sum_pcm, CAST(sum(abs(p)) AS BIGINT) AS abs_pcm,
           |           CAST(sum(p * (pos + 1)) AS BIGINT) AS wsum_pcm
           |         FROM pcm GROUP BY id, ch)
           |SELECT q.id, q.ch AS channel, 1 AS ms_mask,
           |       q.n_nonzero_q, q.sum_q, q.wsum_q,
           |       a.n_samples, a.n_clipped, a.n_nonzero,
           |       a.sum_pcm, a.abs_pcm, a.wsum_pcm
           |FROM qagg q JOIN pagg a ON q.id = a.id AND q.ch = a.ch
           |ORDER BY q.id, q.ch""".stripMargin)),
    "multimodal_aac_short" -> Q(multimodalAacShort, Some(
      // restates aacShortAssets' WINDOW-SWITCHED stream end to end
      // (round 15 — the r14 VERDICT's largest remaining codec gap):
      // per-frame dequantization (long layout for the START/STOP
      // frames, grouped window-major for the EIGHT_SHORT frame), the
      // 2048-point IMDCT under the LONG_START/LONG_STOP transition
      // windows, eight 256-point IMDCTs short-sine-windowed and
      // overlap-added at 448 + 128w, the cross-frame overlap-add
      // out_f(n) = z_f(n) + z_{f−1}(n+1024), and the floor-form 16-bit
      // quantizer — integer aggregates absorb the ~1-ulp libm noise
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 5),
           |par AS (SELECT id, 6 + id % 3 AS msl, 4 + id % 3 AS mss,
           |               96 + id % 8 AS gg0, 96 + (id + 3) % 8 AS gg2,
           |               100 + id % 6 AS gg1 FROM ids),
           |lco AS (SELECT p.id, f.f, d.i,
           |          (CASE WHEN (p.id + d.i + f.f) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i + f.f) % 3) AS q,
           |          (CASE WHEN f.f = 0 THEN p.gg0 ELSE p.gg2 END)
           |            + (p.id + 3*(d.i // 32) + f.f) % 9 - 4 AS sf
           |        FROM par p, (SELECT unnest([0, 1]) AS f) f,
           |             (SELECT unnest(range(0, 1024)) AS i) d
           |        WHERE d.i < 32 * p.msl AND (p.id + d.i // 32 + f.f) % 3 != 0),
           |lnz AS (SELECT id, f, list(struct_pack(k := i,
           |            v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100))) ORDER BY i) AS l
           |        FROM lco WHERE q != 0 GROUP BY id, f),
           |lz AS (SELECT z.id, z.f, d.n,
           |         (CASE WHEN z.f = 0 THEN
           |            CASE WHEN d.n < 1024 THEN sin(pi()/2048*(d.n + 0.5))
           |                 WHEN d.n < 1472 THEN 1.0
           |                 WHEN d.n < 1600 THEN sin(pi()/256*(d.n - 1472 + 128 + 0.5))
           |                 ELSE 0.0 END
           |          ELSE
           |            CASE WHEN d.n < 448 THEN 0.0
           |                 WHEN d.n < 576 THEN sin(pi()/256*(d.n - 448 + 0.5))
           |                 WHEN d.n < 1024 THEN 1.0
           |                 ELSE sin(pi()/2048*(d.n + 0.5)) END
           |          END)
           |         * (list_sum(list_transform(z.l, s ->
           |              s.v * cos(pi()/1024.0 * (d.n + 512.5) * (s.k + 0.5)))) / 1024.0) AS z
           |       FROM lnz z, (SELECT unnest(range(0, 2048)) AS n) d),
           |lz0 AS (SELECT id, list(z ORDER BY n) AS zl FROM lz WHERE f = 0 GROUP BY id),
           |lz2 AS (SELECT id, list(z ORDER BY n) AS zl FROM lz WHERE f = 1 GROUP BY id),
           |sgw AS (SELECT p.id, w.w,
           |          CASE WHEN p.id % 3 = 0 THEN 0
           |               WHEN p.id % 3 = 1 THEN (CASE WHEN w.w = 0 THEN 0 WHEN w.w <= 2 THEN 1 ELSE 2 END)
           |               ELSE w.w // 2 END AS g
           |        FROM par p, (SELECT unnest(range(0, 8)) AS w) w),
           |sco AS (SELECT p.id, g.w, d.j,
           |          (CASE WHEN (p.id + 128*g.w + d.j) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + 128*g.w + d.j) % 3) AS q,
           |          p.gg1 + (p.id + 3*(d.j // 8) + 2*g.g) % 9 - 4 AS sf
           |        FROM par p JOIN sgw g ON g.id = p.id,
           |             (SELECT unnest(range(0, 128)) AS j) d
           |        WHERE d.j // 8 < p.mss AND (p.id + g.g + d.j // 8) % 3 != 0),
           |snz AS (SELECT id, w, list(struct_pack(k := j,
           |            v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100))) ORDER BY j) AS l
           |        FROM sco WHERE q != 0 GROUP BY id, w),
           |sz AS (SELECT z.id, 448 + 128*z.w + d.k AS n,
           |         sin(pi()/256*(d.k + 0.5)) *
           |         (list_sum(list_transform(z.l, s ->
           |            s.v * cos(pi()/128.0 * (d.k + 64.5) * (s.k + 0.5)))) / 128.0) AS zz
           |       FROM snz z, (SELECT unnest(range(0, 256)) AS k) d),
           |sz1 AS (SELECT id, n, sum(zz) AS z FROM sz GROUP BY id, n),
           |szl AS (SELECT i.id, list(COALESCE(s.z, 0.0) ORDER BY d.n) AS zl
           |        FROM ids i CROSS JOIN (SELECT unnest(range(0, 2048)) AS n) d
           |        LEFT JOIN sz1 s ON s.id = i.id AND s.n = d.n
           |        GROUP BY i.id),
           |pcm AS (SELECT a.id, d.p,
           |          greatest(-32768, least(32767, CAST(floor((
           |            CASE WHEN d.p < 1024 THEN a0.zl[d.p + 1]
           |                 WHEN d.p < 2048 THEN s.zl[d.p - 1024 + 1] + a0.zl[d.p + 1]
           |                 ELSE a2.zl[d.p - 2048 + 1] + s.zl[d.p - 1024 + 1] END
           |            ) * 32768.0 + 0.5) AS BIGINT))) AS v
           |        FROM ids a
           |        JOIN lz0 a0 ON a0.id = a.id
           |        JOIN lz2 a2 ON a2.id = a.id
           |        JOIN szl s ON s.id = a.id,
           |             (SELECT unnest(range(0, 3072)) AS p) d)
           |SELECT id, 3::INT AS n_frames, count(*) AS n_samples,
           |  CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |  CAST(sum(CASE WHEN v != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |  CAST(sum(v) AS BIGINT) AS sum_pcm, CAST(sum(abs(v)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(v * (p + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm GROUP BY id ORDER BY id""".stripMargin)),
    "multimodal_aac_pulse" -> Q(multimodalAacPulse, Some(
      // restates aacPulseAssets' pulse_data end to end (late round 15):
      // the base quantized formula, the accumulated pulse positions
      // (start SWB + running offsets), the §9.3 sign-preserving adds
      // (zero values take MINUS amp — the faad2/ffmpeg rule, r16),
      // and the dequantization over the pulsed integers — integer
      // checksums exact, the two dequantized sums under the floor-form
      // 4-dp round (left-to-right list folds on both engines)
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
           |par AS (SELECT id, 96 + id % 8 AS gg, 32 * (2 + id % 3) AS start,
           |               1 + id % 4 AS n FROM ids),
           |pul AS (SELECT p.id,
           |          p.start + (j.j + 1) + CAST(list_sum(list_transform(range(0, j.j + 1),
           |            m -> (p.id + 2*m) % 5)) AS BIGINT) AS pos,
           |          1 + (p.id + j.j) % 15 AS amp
           |        FROM par p, (SELECT unnest(range(0, 4)) AS j) j
           |        WHERE j.j < p.n),
           |co AS (SELECT p.id, d.i,
           |         CASE WHEN d.i >= 256 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i) % 3)
           |         END AS q
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d),
           |cop AS (SELECT co.id, co.i,
           |          CASE WHEN pl.amp IS NULL THEN co.q
           |               WHEN co.q > 0 THEN co.q + pl.amp
           |               ELSE co.q - pl.amp END AS q
           |        FROM co LEFT JOIN pul pl ON pl.id = co.id AND pl.pos = co.i),
           |qs AS (SELECT id, list(q ORDER BY i) AS q FROM cop GROUP BY id),
           |xrs AS (SELECT s.id, s.q, p.gg,
           |  list_transform(range(0, 1024), i ->
           |    CASE WHEN s.q[i+1] = 0 THEN 0.0 ELSE
           |      sign(s.q[i+1]) * pow(abs(s.q[i+1]), 4.0/3.0) *
           |      pow(2.0, 0.25*((p.gg + (p.id + 3*(i // 32)) % 9 - 4) - 100))
           |    END) AS xr
           |  FROM qs s JOIN par p ON p.id = s.id)
           |SELECT id, gg AS global_gain, 8::INT AS max_sfb,
           |  8 AS n_coded_sfb,
           |  CAST(list_sum(list_transform(range(0, 8), s ->
           |    gg + (id + 3*s) % 9 - 4)) AS BIGINT) AS sum_sf,
           |  len(list_filter(q, x -> x != 0)) AS n_nonzero,
           |  CAST(list_sum(q) AS BIGINT) AS sum_q,
           |  CAST(list_sum(list_transform(range(1, 1025), i -> q[i] * i)) AS BIGINT) AS wsum_q,
           |  floor(list_sum(xr) * 10000.0 + 0.5) / 10000.0 AS xr_sum,
           |  floor(list_sum(list_transform(range(1, 1025), i -> xr[i] * i)) * 10000.0 + 0.5) / 10000.0 AS xr_wsum
           |FROM xrs ORDER BY id""".stripMargin)),
    "multimodal_aac_tns" -> Q(multimodalAacTns, Some(
      // restates aacTnsAssets' TNS decode end to end (late round 15):
      // dequantization, the §14.6.2 coefficient chain (sign extension,
      // the ± iqfac split, order-1 LPC a₁ = sin(c/iqfac±)), the
      // ALL-POLE filter over samples 128..256 in its CLOSED form
      // y(n) = Σₖ (−a₁)ᵏ·x(n∓k) (order 1 makes the AR recursion a
      // geometric sum — the recursion-vs-sum float divergence sits 8+
      // orders below the 16-bit grid), then IMDCT → sine window →
      // floor-form quantizer with the aac_pcm integer aggregates
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 6),
           |par AS (SELECT id, 8 AS max_sfb, 96 + id % 8 AS gg,
           |               (3 * id + 1) % 7 - 3 AS c, id % 2 AS res,
           |               id % 2 = 1 AS down FROM ids),
           |co AS (SELECT p.id, d.i,
           |         CASE WHEN d.i >= 32 * p.max_sfb OR (p.id + d.i // 32) % 3 = 0 THEN 0 ELSE
           |           (CASE WHEN (p.id + d.i) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i) % 3) END AS q,
           |         p.gg + (p.id + 3*(d.i // 32)) % 9 - 4 AS sf
           |       FROM par p, (SELECT unnest(range(0, 1024)) AS i) d),
           |xrl AS (SELECT id, list(CASE WHEN q = 0 THEN 0.0 ELSE
           |            sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100)) END
           |          ORDER BY i) AS x
           |        FROM co GROUP BY id),
           |lpc AS (SELECT p.id, p.down,
           |          sin(p.c / (CASE WHEN p.c >= 0
           |            THEN (pow(2, p.res + 2) - 0.5) / (pi() / 2.0)
           |            ELSE (pow(2, p.res + 2) + 0.5) / (pi() / 2.0) END)) AS a1
           |        FROM par p),
           |tn AS (SELECT x.id,
           |         list_transform(range(0, 1024), n ->
           |           CASE WHEN n < 128 OR n >= 256 THEN x.x[n + 1]
           |                WHEN NOT l.down THEN
           |                  list_sum(list_transform(range(0, n - 128 + 1), k ->
           |                    pow(-l.a1, k) * x.x[n - k + 1]))
           |                ELSE
           |                  list_sum(list_transform(range(0, 256 - n), k ->
           |                    pow(-l.a1, k) * x.x[n + k + 1]))
           |           END) AS x
           |       FROM xrl x JOIN lpc l ON l.id = x.id),
           |nz AS (SELECT t.id, list(struct_pack(k := d.i, v := t.x[d.i + 1]) ORDER BY d.i) AS l
           |       FROM tn t, (SELECT unnest(range(0, 1024)) AS i) d
           |       WHERE t.x[d.i + 1] != 0 GROUP BY t.id),
           |pcm AS (SELECT z.id, d.pos,
           |          greatest(-32768, least(32767, CAST(floor(
           |            sin(pi()/2048.0 * (d.pos + 0.5)) *
           |            (list_sum(list_transform(z.l, s ->
           |               s.v * cos(pi()/1024.0 * (d.pos + 512.5) * (s.k + 0.5)))) / 1024.0)
           |            * 32768.0 + 0.5) AS BIGINT))) AS p
           |        FROM nz z, (SELECT unnest(range(0, 1024)) AS pos) d)
           |SELECT id, count(*) AS n_samples,
           |  CAST(sum(CASE WHEN p = 32767 OR p = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |  CAST(sum(CASE WHEN p != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |  CAST(sum(p) AS BIGINT) AS sum_pcm, CAST(sum(abs(p)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(p * (pos + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm GROUP BY id ORDER BY id""".stripMargin)),
    "multimodal_aac_kbd" -> Q(multimodalAacKbd, Some(
      // restates aacKbdAssets' SHAPE-SWITCHED stream end to end (late
      // round 15): the KBD window derived IN SQL from the Bessel-I0
      // series (term_k = exp(2k·ln(x/2) − 2·lgamma(k+1)), cumulative
      // kernel sums, the Princen-Bradley sqrt), the §14.3.3
      // previous-shape rule on every rising half, the IMDCT over the
      // nonzero struct list, cross-frame overlap-add, and the
      // floor-form 16-bit quantizer — the ~1e-14 series-vs-iterative
      // Bessel noise sits 9+ orders below the integer grid
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 5),
           |kern AS (SELECT list_transform(range(0, 1025), j ->
           |    CASE WHEN j = 0 OR j = 1024 THEN 1.0 ELSE
           |      list_sum(list_transform(range(0, 50), k ->
           |        CASE WHEN k = 0 THEN 1.0 ELSE
           |          exp(2*k*ln(pi()*2.0*sqrt(1.0 - (2.0*j/1024.0 - 1.0)*(2.0*j/1024.0 - 1.0)))
           |              - 2*lgamma(k + 1.0)) END))
           |    END) AS kv),
           |kbd AS (SELECT list_transform(range(0, 1024), n ->
           |    sqrt(list_sum(k.kv[1:(n + 1)]) / list_sum(k.kv))) AS w FROM kern k),
           |fs AS (SELECT unnest(range(0, 3)) AS f),
           |par AS (SELECT id, f, 6 + (id + f) % 3 AS ms, 96 + (id + 2*f) % 8 AS gg,
           |        CASE WHEN f = 0 THEN id % 2 WHEN f = 1 THEN 1 ELSE 0 END AS sh,
           |        CASE WHEN f = 0 THEN 0 WHEN f = 1 THEN id % 2 ELSE 1 END AS psh
           |  FROM ids, fs),
           |co AS (SELECT p.id, p.f, d.i,
           |        (CASE WHEN (p.id + d.i + p.f) % 5 < 2 THEN -1 ELSE 1 END) * ((p.id + d.i + p.f) % 3) AS q,
           |        p.gg + (p.id + 3*(d.i // 32) + p.f) % 9 - 4 AS sf
           |      FROM par p, (SELECT unnest(range(0, 1024)) AS i) d
           |      WHERE d.i < 32 * p.ms AND (p.id + d.i // 32 + p.f) % 3 != 0),
           |nz AS (SELECT id, f, list(struct_pack(k := i,
           |          v := sign(q) * pow(abs(q), 4.0/3.0) * pow(2.0, 0.25*(sf - 100))) ORDER BY i) AS l
           |      FROM co WHERE q != 0 GROUP BY id, f),
           |lz AS (SELECT z.id, z.f, d.n,
           |        (CASE WHEN d.n < 1024 THEN
           |           CASE WHEN p.psh = 0 THEN sin(pi()/2048*(d.n + 0.5)) ELSE b.w[d.n + 1] END
           |         ELSE
           |           CASE WHEN p.sh = 0 THEN sin(pi()/2048*(d.n + 0.5)) ELSE b.w[2047 - d.n + 1] END
           |         END)
           |        * (list_sum(list_transform(z.l, s ->
           |             s.v * cos(pi()/1024.0 * (d.n + 512.5) * (s.k + 0.5)))) / 1024.0) AS z
           |      FROM nz z JOIN par p ON p.id = z.id AND p.f = z.f,
           |           kbd b, (SELECT unnest(range(0, 2048)) AS n) d),
           |zl AS (SELECT id, f, list(z ORDER BY n) AS zl FROM lz GROUP BY id, f),
           |zz AS (SELECT a.id, a.zl AS z0, b.zl AS z1, c.zl AS z2
           |       FROM zl a JOIN zl b ON b.id = a.id AND b.f = 1
           |       JOIN zl c ON c.id = a.id AND c.f = 2
           |       WHERE a.f = 0),
           |pcm AS (SELECT id, d.p,
           |          greatest(-32768, least(32767, CAST(floor((
           |            CASE WHEN d.p < 1024 THEN z0[d.p + 1]
           |                 WHEN d.p < 2048 THEN z1[d.p - 1024 + 1] + z0[d.p + 1]
           |                 ELSE z2[d.p - 2048 + 1] + z1[d.p - 1024 + 1] END
           |            ) * 32768.0 + 0.5) AS BIGINT))) AS v
           |        FROM zz, (SELECT unnest(range(0, 3072)) AS p) d)
           |SELECT id, 3::INT AS n_frames, count(*) AS n_samples,
           |  CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           |  CAST(sum(CASE WHEN v != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           |  CAST(sum(v) AS BIGINT) AS sum_pcm, CAST(sum(abs(v)) AS BIGINT) AS abs_pcm,
           |  CAST(sum(v * (p + 1)) AS BIGINT) AS wsum_pcm
           |FROM pcm GROUP BY id ORDER BY id""".stripMargin)),
    "multimodal_aac_codebook" -> Q(multimodalAacCodebook, Some(
      // the caller-supplied-book contract: decode-with succeeds (integer
      // checksums over the escape-bearing formula spectrum), strict
      // reject without — both flags constant 1 by construction, the
      // checksums pin the escape arithmetic (values 17..36 through the
      // N-ones + 0 + (N+4)-bit sequences)
      raw"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 50),
           |qs AS (SELECT id, list_transform(range(0, 1024), i ->
           |        CASE WHEN i >= 128 THEN 0 ELSE
           |          (CASE WHEN (id+i) % 5 < 2 THEN -1 ELSE 1 END) *
           |          (CASE WHEN (id+i) % 8 = 7 THEN 17 + (id+i) % 20
           |                WHEN (id+i) % 8 = 0 OR (id+i) % 8 = 3 THEN 0
           |                ELSE 1 END)
           |        END) AS q FROM ids)
           |SELECT id, 1 AS with_books, 1 AS without_rejects,
           |  len(list_filter(q, x -> x != 0)) AS n_nonzero,
           |  CAST(list_sum(q) AS BIGINT) AS sum_q,
           |  CAST(list_sum(list_transform(range(1, 1025), i -> q[i] * i)) AS BIGINT) AS wsum_q
           |FROM qs ORDER BY id""".stripMargin)),
    "multimodal_knn" -> Q(multimodalKnn, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (3 + doc_id % 5)::INT AS width, (2 + doc_id % 3)::INT AS height,
        |         (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)::INT AS ch,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_png8_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |s AS (SELECT id, (j.j * 2 + 1)::INT AS pos, hx
        |      FROM p, unnest(range(0, width * height * ch)) AS j(j)),
        |b AS (SELECT id, (strpos('0123456789abcdef', substr(hx, pos, 1)) - 1) AS bin FROM s),
        |h AS (SELECT id, bin, count(*)::DOUBLE AS c FROM b GROUP BY id, bin),
        |g AS (SELECT pr.id, pr.bin, coalesce(h.c, 0.0) AS c
        |      FROM (SELECT p.id, r.r AS bin FROM p, unnest(range(0, 16)) AS r(r)) pr
        |      LEFT JOIN h ON h.id = pr.id AND h.bin = pr.bin),
        |q AS (SELECT bin, c AS qc FROM g WHERE id = 0),
        |d AS (SELECT g.id, sum((g.c - q.qc) * (g.c - q.qc)) AS d2
        |      FROM g JOIN q USING (bin) GROUP BY g.id)
        |SELECT id, round(1.0/(1.0 + d2), 4) AS score
        |FROM d ORDER BY score DESC, id LIMIT 10""".stripMargin)),
    "multimodal_png_stats" -> Q(multimodalPngStats, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (3 + doc_id % 5)::INT AS width, (2 + doc_id % 3)::INT AS height,
        |         (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)::INT AS ch,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_png8_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |s AS (SELECT id, ch, width * height AS n_px, c.c::INT AS channel, j.j AS j,
        |        ((j.j * ch + c.c) * 2 + 1)::INT AS pos, hx
        |      FROM p, unnest(range(0, ch)) AS c(c),
        |              unnest(range(0, width * height)) AS j(j)),
        |v AS (SELECT id, channel, n_px,
        |        (strpos('0123456789abcdef', substr(hx, pos, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(hx, pos + 1, 1)) - 1) AS u
        |      FROM s)
        |SELECT id, channel, n_px::INT AS n_px,
        |       CAST(sum(u) AS BIGINT) AS sum_val,
        |       floor(sum(u)::DOUBLE / n_px * 10000.0 + 0.5) / 10000.0 AS mean_val
        |FROM v GROUP BY id, channel, n_px
        |ORDER BY id, channel""".stripMargin)),
    "multimodal_mp3_frames" -> Q(multimodalMp3Frames, Some(
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         (2 + doc_id % 2)::INT AS n_frames,
        |         (32 + 8 * (doc_id % 3))::INT AS bitrate_kbps,
        |         (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)::INT AS sample_rate,
        |         array_to_string(list_transform(range(0, 40), i -> md5(text || '_mp3_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |f AS (SELECT *, ((144 * bitrate_kbps * 1000) // sample_rate - 4)::INT AS plen FROM p)
        |SELECT id, i::INT AS frame_idx, plen AS frame_len,
        |       md5(substr(hx, (i * plen * 2 + 1)::INT, (plen * 2)::INT)) AS frame_fp
        |FROM f, unnest(range(0, n_frames)) AS t(i)
        |ORDER BY id, frame_idx""".stripMargin)),
    "multimodal_wav_channels" -> Q(multimodalWavChannels, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (1 + doc_id % 2)::INT AS channels,
        |         (30 + doc_id % 7)::INT AS n_samples,
        |         array_to_string(list_transform(range(0, 10), i -> md5(text || '_wav_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |s AS (SELECT id, channels, n_samples, c.c::INT AS channel, j.j AS j,
        |        ((j.j * channels + c.c) * 4 + 1)::INT AS pos, hx
        |      FROM p, unnest(range(0, channels)) AS c(c),
        |              unnest(range(0, n_samples)) AS j(j)),
        |v AS (SELECT id, channel, n_samples,
        |        (strpos('0123456789abcdef', substr(hx, pos + 2, 1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(hx, pos + 3, 1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(hx, pos, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(hx, pos + 1, 1)) - 1) AS u
        |      FROM s)
        |SELECT id, channel, n_samples,
        |       CAST(sum(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS BIGINT) AS sum_amp,
        |       floor(sum(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)::DOUBLE
        |             / n_samples * 10000.0 + 0.5) / 10000.0 AS mean_amp
        |FROM v GROUP BY id, channel, n_samples
        |ORDER BY id, channel""".stripMargin)),
    "multimodal_mp4_parse" -> Q(multimodalMp4Parse, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, 'isom' AS brand,
        |         (16 * (1 + doc_id % 4))::INT AS width,
        |         (16 * (1 + doc_id % 3))::INT AS height,
        |         1000::BIGINT AS timescale, (100 + doc_id % 50)::BIGINT AS duration,
        |         1::INT AS n_tracks,
        |         (2 + doc_id % 5)::INT AS n_samples, (8 + doc_id % 8)::INT AS sample_size,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_mp4_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50)
        |SELECT id, brand, width, height, timescale, duration, n_tracks,
        |       n_samples, sample_size,
        |       md5(substr(hx, 1, n_samples * sample_size * 2)) AS mdat_fp
        |FROM p ORDER BY id""".stripMargin)),
    "multimodal_mp4_samples" -> Q(multimodalMp4Samples, Some(
      """WITH p AS (
        |  SELECT doc_id AS id,
        |         (2 + doc_id % 5)::INT AS n_samples, (8 + doc_id % 8)::INT AS s,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_mp4_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50)
        |SELECT id, i::INT AS sample_idx, s AS sample_len,
        |       md5(substr(hx, (i * s * 2 + 1)::INT, (s * 2)::INT)) AS sample_fp
        |FROM p, unnest(range(0, n_samples)) AS t(i)
        |WHERE i % 2 = 0
        |ORDER BY id, sample_idx""".stripMargin)),
    "multimodal_png_decode" -> Q(multimodalPngDecode, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (3 + doc_id % 5)::INT AS width, (2 + doc_id % 3)::INT AS height,
        |         (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)::INT AS n_channels,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_png8_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50)
        |SELECT id, width, height, n_channels,
        |       md5(substr(hx, 1, width*height*n_channels*2)) AS pixel_fp
        |FROM p ORDER BY id""".stripMargin)),
    "multimodal_ppm_decode" -> Q(multimodalPpmDecode, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (3 + doc_id % 5)::INT AS width, (2 + doc_id % 3)::INT AS height,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_p6_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50)
        |SELECT id, width, height, (width*height*3)::INT AS n_pixels,
        |       md5(substr(hx, 1, width*height*6)) AS pixel_fp
        |FROM p ORDER BY id""".stripMargin)),
    "multimodal_ppm_resize" -> Q(multimodalPpmResize, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (3 + doc_id % 5) AS w, (2 + doc_id % 3) AS h,
        |         array_to_string(list_transform(range(0, 6), i -> md5(text || '_p6_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |b AS (SELECT id, substr(hx, 1, CAST(w*h*6 AS INT)) AS phx, w*h*3 AS len FROM p),
        |kk AS (SELECT id, phx, len, greatest(1, (len + 15) // 16) AS k FROM b),
        |r AS (SELECT id, (len + k - 1) // k AS n,
        |        array_to_string(list_transform(range(0, (len + k - 1) // k),
        |          j -> substr(phx, CAST(j*k*2 + 1 AS INT), 2)), '') AS s
        |      FROM kk)
        |SELECT id, 4 AS out_w, 4 AS out_h, CAST(n AS INT) AS n_sampled, md5(s) AS resized_fp
        |FROM r ORDER BY id""".stripMargin)),
    "multimodal_wav_decode" -> Q(multimodalWavDecode, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (1 + doc_id % 2)::INT AS channels,
        |         (8000 + (doc_id % 3) * 4000)::INT AS sample_rate,
        |         (30 + doc_id % 7)::INT AS n_samples,
        |         array_to_string(list_transform(range(0, 10), i -> md5(text || '_wav_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50)
        |SELECT id, channels, sample_rate, n_samples,
        |       md5(substr(hx, 1, n_samples * channels * 4)) AS pcm_fp
        |FROM p ORDER BY id""".stripMargin)),
    "multimodal_wav_frames" -> Q(multimodalWavFrames, Some(
      """WITH p AS (
        |  SELECT doc_id AS id, (400 + (doc_id % 5) * 160) AS len,
        |         array_to_string(list_transform(range(0, 65), i -> md5(text || '_wavf_' || i)), '') AS hx
        |  FROM documents WHERE doc_id < 50),
        |f AS (SELECT id, substr(hx, 1, CAST(len*2 AS INT)) AS phx,
        |        unnest(range(0, (len + 255) // 256)) AS frame_idx
        |      FROM p)
        |SELECT id, CAST(frame_idx AS INT) AS frame_idx,
        |       md5(substr(phx, CAST(frame_idx*512 + 1 AS INT), 512)) AS frame_fp
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY id, frame_idx""".stripMargin)),
    "multimodal_jpeg_decode" -> Q(multimodalJpegDecode, Some(jpegDecodeSql)),
    "multimodal_jpeg_restart" -> Q(multimodalJpegRestart, Some(jpegDecodeSql)),
    "multimodal_jpeg_progressive" -> Q(multimodalJpegProgressive, Some(jpegDecodeSql)),
    "streaming_media_decode" -> Q(streamingMediaDecode, Some(jpegDecodeSql)),
    "multimodal_jpeg_color" -> Q(multimodalJpegColor, Some(
      // per block b: (y, cb, cr) = payload bytes 3b..3b+2; RGB = JFIF
      // conversion with floor(x+0.5) + clamp; every pixel of block
      // (bx, by) carries that block's rgb hex triple
      """WITH p AS (
        |  SELECT doc_id AS id, (1 + doc_id % 4) AS bw, (1 + doc_id % 3) AS bh,
        |         md5(text || '_jpgc_0') || md5(text || '_jpgc_1') || md5(text || '_jpgc_2') AS hx
        |  FROM documents WHERE doc_id < 50),
        |bl AS (
        |  SELECT id, bw, bh, b,
        |         ('0x' || substr(hx, CAST(b*6 + 1 AS INT), 2))::INT AS y,
        |         ('0x' || substr(hx, CAST(b*6 + 3 AS INT), 2))::INT AS cb,
        |         ('0x' || substr(hx, CAST(b*6 + 5 AS INT), 2))::INT AS cr
        |  FROM (SELECT id, bw, bh, hx, unnest(range(0, bw*bh)) AS b FROM p)),
        |rgbs AS (
        |  SELECT id, bw, bh, b,
        |         printf('%02x%02x%02x',
        |           CAST(greatest(0, least(255, floor(y + 1.402*(cr - 128) + 0.5))) AS INT),
        |           CAST(greatest(0, least(255, floor(y - 0.344136*(cb - 128) - 0.714136*(cr - 128) + 0.5))) AS INT),
        |           CAST(greatest(0, least(255, floor(y + 1.772*(cb - 128) + 0.5))) AS INT)) AS rgbhex
        |  FROM bl),
        |agg AS (SELECT id, bw*8 AS w, bh*8 AS h, bw, list(rgbhex ORDER BY b) AS bls
        |        FROM rgbs GROUP BY 1, 2, 3, 4)
        |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, 3 AS n_channels,
        |       md5(array_to_string(list_transform(range(0, w*h),
        |         q -> bls[CAST((q // (w*8)) * bw + (q % w) // 8 + 1 AS INT)]), '')) AS pixel_fp
        |FROM agg ORDER BY id""".stripMargin)),
    "multimodal_jpeg_420" -> Q(multimodalJpeg420, Some(
      // 4:2:0: per MCU m (mw x mh grid of 16x16 px), payload bytes
      // 6m..6m+3 = the four 8x8 luma blocks (row-major within the MCU),
      // 6m+4/6m+5 = cb/cr for the whole MCU (replication-upsampled).
      // Each luma block b of the (2mw x 2mh) grid resolves its (y, cb, cr)
      // triple, then the pixel gather + JFIF conversion are verbatim the
      // color gate's.
      """WITH p AS (
        |  SELECT doc_id AS id, (1 + doc_id % 3) AS mw, (1 + doc_id % 2) AS mh,
        |         md5(text || '_jp420_0') || md5(text || '_jp420_1') || md5(text || '_jp420_2') AS hx
        |  FROM documents WHERE doc_id < 50),
        |bl AS (
        |  SELECT id, mw, mh, hx, b,
        |         ((b // (mw*2)) // 2) * mw + ((b % (mw*2)) // 2) AS m,
        |         ((b // (mw*2)) % 2) * 2 + ((b % (mw*2)) % 2) AS ypos
        |  FROM (SELECT id, mw, mh, hx, unnest(range(0, mw*mh*4)) AS b FROM p)),
        |bv AS (
        |  SELECT id, mw, mh, b,
        |         ('0x' || substr(hx, CAST((m*6 + ypos)*2 + 1 AS INT), 2))::INT AS y,
        |         ('0x' || substr(hx, CAST((m*6 + 4)*2 + 1 AS INT), 2))::INT AS cb,
        |         ('0x' || substr(hx, CAST((m*6 + 5)*2 + 1 AS INT), 2))::INT AS cr
        |  FROM bl),
        |rgbs AS (
        |  SELECT id, mw, mh, b,
        |         printf('%02x%02x%02x',
        |           CAST(greatest(0, least(255, floor(y + 1.402*(cr - 128) + 0.5))) AS INT),
        |           CAST(greatest(0, least(255, floor(y - 0.344136*(cb - 128) - 0.714136*(cr - 128) + 0.5))) AS INT),
        |           CAST(greatest(0, least(255, floor(y + 1.772*(cb - 128) + 0.5))) AS INT)) AS rgbhex
        |  FROM bv),
        |agg AS (SELECT id, mw*16 AS w, mh*16 AS h, mw*2 AS bwg, list(rgbhex ORDER BY b) AS bls
        |        FROM rgbs GROUP BY 1, 2, 3, 4)
        |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, 3 AS n_channels,
        |       md5(array_to_string(list_transform(range(0, w*h),
        |         q -> bls[CAST((q // (w*8)) * bwg + (q % w) // 8 + 1 AS INT)]), '')) AS pixel_fp
        |FROM agg ORDER BY id""".stripMargin)),
    "events_window" -> Q(eventsWindow, Some(
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) / count(*) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "events_funnel" -> Q(eventsFunnel, Some(
      """WITH firsts AS (
        |  SELECT user_id, event_type, min(ts) AS t0 FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') GROUP BY 1, 2),
        |p AS (SELECT user_id,
        |  max(CASE WHEN event_type = 'view' THEN t0 END) AS tv,
        |  max(CASE WHEN event_type = 'click' THEN t0 END) AS tc,
        |  max(CASE WHEN event_type = 'purchase' THEN t0 END) AS tp
        |  FROM firsts GROUP BY 1)
        |SELECT count(CASE WHEN tv IS NOT NULL THEN 1 END) AS s1,
        |       count(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 END) AS s2,
        |       count(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc THEN 1 END) AS s3
        |FROM p""".stripMargin)),
    "retention_cohorts" -> Q(retentionCohorts, Some(
      """WITH e AS (SELECT user_id, date_trunc('day', ts)::DATE AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
        |       e.d - c.cohort AS day_offset,
        |       count(DISTINCT e.user_id) AS active_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "events_json" -> Q(eventsJson, Some(
      """SELECT event_type, count(*) AS n, round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    "tpch_q1" -> Q(tpchQ1, Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "tpch_q3" -> Q(tpchQ3, Some(
      """SELECT l_orderkey,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                     (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),
    "join_top_customers" -> Q(joinTopCustomers, Some(
      """SELECT c_custkey, c_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),
    "lang_id" -> Q(langId, Some(
      raw"""WITH $toksCte,
           |c AS (SELECT id,
           |  len(list_filter(toks, w -> w IN $enList)) AS en,
           |  len(list_filter(toks, w -> w IN $deList)) AS de,
           |  len(list_filter(toks, w -> w IN $frList)) AS fr,
           |  len(toks) AS n FROM t)
           |SELECT id,
           |  CASE WHEN en >= greatest(de, fr) THEN 'en'
           |       WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang,
           |  round(en::DOUBLE / n, 4) AS en_ratio
           |FROM c ORDER BY id""".stripMargin)),
    "quality_score" -> Q(qualityScore, Some(
      raw"""WITH $toksCte,
           |m AS (SELECT id,
           |  len(toks)::DOUBLE AS n_tok,
           |  len(list_filter(toks, w -> w IN $enList))::DOUBLE / len(toks) AS stop_ratio,
           |  length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / len(toks) AS avg_wlen
           |  FROM t)
           |SELECT id, n_tok::BIGINT AS n_tok, round(stop_ratio, 4) AS stop_ratio,
           |  round(avg_wlen, 4) AS avg_wlen,
           |  floor((0.4 * least(1.0, n_tok / 50.0) + 0.3 * least(1.0, stop_ratio * 5.0)
           |      + 0.3 * least(1.0, avg_wlen / 5.0)) * 10000.0 + 0.5) / 10000.0 AS quality
           |FROM m ORDER BY id""".stripMargin)),
    "token_count" -> Q(tokenCount, Some(
      raw"""SELECT doc_id AS id,
           |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS ws_tokens,
           |  len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS subword_tokens,
           |  length(text)::BIGINT AS n_chars
           |FROM documents ORDER BY id""".stripMargin)),
    "lm_score" -> Q(lmScoreQ, Some(
      raw"""WITH $toksCte,
           |tf AS (SELECT id, unnest(toks) AS term FROM t),
           |freq AS (SELECT term, count(*)::DOUBLE AS c FROM tf GROUP BY 1),
           |tot AS (SELECT sum(c) AS n FROM freq),
           |s AS (SELECT tf.id, ln(freq.c / tot.n) AS lp FROM tf JOIN freq USING (term), tot)
           |SELECT id, count(*)::BIGINT AS n_tok, round(avg(lp), 4) AS avg_logp,
           |       round(-avg(lp)/ln(2), 4) AS bits_per_token
           |FROM s GROUP BY id ORDER BY id""".stripMargin)),
    "quality_funnel" -> Q(qualityFunnel, Some(qualityFunnelSql)),
    "streaming_quality_filter" -> Q(
      (s, d) => graft.streaming.StreamingGates.qualityFilter(s, d).orderBy(col("id")),
      Some(qualityFunnelSql)),
    "pseudonymize" -> Q(pseudonymizeQ, Some(
      """WITH g AS (SELECT event_type, date_trunc('day', ts) AS dd,
        |                  count(DISTINCT user_id) AS n_users
        |           FROM events GROUP BY 1, 2),
        |thr AS (SELECT 0.9 * avg(n_users) AS t FROM g),
        |keep AS (SELECT event_type, dd FROM g, thr WHERE n_users >= t)
        |SELECT e.event_id AS id,
        |       sha256('graft:' || e.user_id::VARCHAR) AS uid_hash,
        |       e.event_type
        |FROM events e JOIN keep k
        |  ON e.event_type = k.event_type AND date_trunc('day', e.ts) = k.dd
        |ORDER BY id""".stripMargin)),
    "pack_sequences" -> Q(packSequences, Some(
      raw"""WITH t AS (
           |  SELECT lang, doc_id AS id,
           |         len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
           |  FROM documents),
           |p AS (
           |  SELECT lang, id, n_tok,
           |         CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS pack
           |  FROM t)
           |SELECT lang, pack, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_tokens
           |FROM p GROUP BY lang, pack ORDER BY lang, pack""".stripMargin)),
    "fingerprint" -> Q(fingerprintQ, Some(
      raw"""WITH n AS (SELECT doc_id AS id,
           |  lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt FROM documents)
           |SELECT id, md5(nt) AS fp, md5(substr(nt, 1, 128)) AS fp_prefix
           |FROM n ORDER BY id""".stripMargin)),
    "winnow_fp" -> Q(winnowFp, Some(
      raw"""WITH $winnowCtes
           |SELECT id, count(*) AS n_fp, min(fp) AS min_fp
           |FROM fps GROUP BY id ORDER BY id""".stripMargin)),
    "containment" -> Q(containmentQ, Some(
      raw"""WITH $winnowCtes,
           |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20),
           |pr AS (SELECT fps.id, fps.fp FROM fps JOIN keep USING (fp))
           |SELECT l.id AS a, r.id AS b, count(*) AS shared
           |FROM pr l JOIN pr r ON l.fp = r.fp AND l.id < r.id
           |GROUP BY 1, 2 HAVING count(*) >= 5
           |ORDER BY shared DESC, a, b""".stripMargin)),
    "containment_incremental" -> Q(containmentIncrementalQ, Some(
      raw"""WITH $winnowCtes,
           |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20),
           |pr AS (SELECT fps.id, fps.fp FROM fps JOIN keep USING (fp))
           |SELECT l.id AS a, r.id AS b, count(*) AS shared
           |FROM pr l JOIN pr r ON l.fp = r.fp AND l.id < r.id
           |GROUP BY 1, 2 HAVING count(*) >= 5
           |  AND r.id >= (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM documents)
           |ORDER BY shared DESC, a, b""".stripMargin)),
    "dedup_clusters" -> Q(dedupClusters, Some(
      raw"""WITH RECURSIVE $shinglesCte,
           |$ccOracleCtes
           |SELECT id, cluster FROM cl ORDER BY id""".stripMargin)),
    "dedup_keep" -> Q(dedupKeep, Some(
      raw"""WITH RECURSIVE $shinglesCte,
           |$ccOracleCtes
           |SELECT d.doc_id AS id FROM documents d
           |LEFT JOIN cl ON d.doc_id = cl.id
           |WHERE cl.id IS NULL OR cl.cluster = d.doc_id
           |ORDER BY id""".stripMargin)),
    "decontaminate" -> Q(decontaminateQ, Some(
      raw"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
           |g AS (SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 3, 0)),
           |      i -> array_to_string(t[i+1:i+4], ' '))) AS gs FROM toks),
           |eg AS (SELECT doc_id, unnest(gs) AS gram FROM g),
           |test AS (SELECT DISTINCT gram FROM eg WHERE doc_id < 100)
           |SELECT eg.doc_id AS id, count(*) AS n_hits
           |FROM eg JOIN test USING (gram)
           |WHERE eg.doc_id >= 100
           |GROUP BY 1 ORDER BY 1""".stripMargin)),
    "repetition_score" -> Q(repetitionScore, Some(
      raw"""WITH $toksCte,
           |g AS (SELECT id, unnest(list_transform(range(0, len(toks)-2),
           |        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gram
           |      FROM t WHERE len(toks) >= 3),
           |c AS (SELECT id, gram, count(*) AS c FROM g GROUP BY 1, 2),
           |a AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_grams, count(*) AS n_distinct, max(c) AS max_c
           |      FROM c GROUP BY 1)
           |SELECT id, n_grams,
           |       round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) AS dup_gram_ratio,
           |       round(CAST(max_c AS DOUBLE) / n_grams, 4) AS top_gram_ratio
           |FROM a ORDER BY id""".stripMargin)),
    "term_topk" -> Q(termTopk, Some(
      raw"""WITH $toksCte,
           |d AS (SELECT id, unnest(list_distinct(toks)) AS term FROM t)
           |SELECT term, count(*) AS df FROM d GROUP BY 1
           |ORDER BY df DESC, term LIMIT 20""".stripMargin)),
    "training_export" -> Q(trainingExport, Some(
      raw"""WITH RECURSIVE $shinglesCte,
           |$ccOracleCtes,
           |keep AS (SELECT d.doc_id AS id FROM documents d
           |         LEFT JOIN cl ON d.doc_id = cl.id
           |         WHERE cl.id IS NULL OR cl.cluster = d.doc_id),
           |m AS (SELECT id,
           |  len(toks)::DOUBLE AS n_tok,
           |  len(list_filter(toks, w -> w IN $enList))::DOUBLE AS en,
           |  len(list_filter(toks, w -> w IN $deList))::DOUBLE AS de,
           |  len(list_filter(toks, w -> w IN $frList))::DOUBLE AS fr,
           |  len(list_filter(toks, w -> w IN $enList))::DOUBLE / len(toks) AS stop_ratio,
           |  length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / len(toks) AS avg_wlen
           |  FROM t),
           |q AS (SELECT id, n_tok::BIGINT AS n_tok,
           |  floor((0.4 * least(1.0, n_tok / 50.0) + 0.3 * least(1.0, stop_ratio * 5.0)
           |      + 0.3 * least(1.0, avg_wlen / 5.0)) * 10000.0 + 0.5) / 10000.0 AS quality,
           |  CASE WHEN en >= greatest(de, fr) THEN 'en'
           |       WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang
           |  FROM m)
           |SELECT q.id, q.n_tok, q.quality FROM q JOIN keep ON q.id = keep.id
           |WHERE q.pred_lang = 'en' AND q.quality >= 0.8 ORDER BY q.id""".stripMargin)),
    "sample_stratified" -> Q(sampleStratified, Some(
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin)),
    "sample_hash" -> Q(sampleHash, Some(
      """SELECT doc_id FROM documents
        |WHERE list_sum(list_transform(range(1, 9), j ->
        |        (strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1)
        |          * pow(2.0, 4 * (8 - j))))
        |      < 429496729
        |ORDER BY doc_id""".stripMargin)),
    "sample_weighted_mix" -> Q(sampleWeightedMix, Some(
      """WITH d AS (SELECT doc_id, source, n_chars,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1)
        |      * pow(2.0, 4 * (8 - j)))) AS draw
        |  FROM documents)
        |SELECT source, count(*) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM d
        |WHERE draw < CASE source WHEN 'src1' THEN 3221225472
        |                         WHEN 'src3' THEN 2147483648
        |                         WHEN 'src7' THEN 1073741824
        |                         ELSE 429496729 END
        |GROUP BY source ORDER BY source""".stripMargin)),
    "streaming_decontaminate" -> Q(streamingDecontaminate, Some(
      raw"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
           |g AS (SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(t) - 3, 0)),
           |      i -> array_to_string(t[i+1:i+4], ' '))) AS gs FROM toks),
           |eg AS (SELECT doc_id, unnest(gs) AS gram FROM g),
           |test AS (SELECT DISTINCT gram FROM eg WHERE doc_id < 100)
           |SELECT eg.doc_id AS id, count(*) AS n_hits
           |FROM eg JOIN test USING (gram)
           |WHERE eg.doc_id >= 100
           |GROUP BY 1 ORDER BY 1""".stripMargin)),
    "streaming_weighted_mix" -> Q(streamingWeightedMix, Some(
      """WITH d AS (SELECT doc_id, source, n_chars,
        |  list_sum(list_transform(range(1, 9), j ->
        |    (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1)
        |      * pow(2.0, 4 * (8 - j)))) AS draw
        |  FROM documents)
        |SELECT source, count(*) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM d
        |WHERE draw < CASE source WHEN 'src1' THEN 3221225472
        |                         WHEN 'src3' THEN 2147483648
        |                         WHEN 'src7' THEN 1073741824
        |                         ELSE 429496729 END
        |GROUP BY source ORDER BY source""".stripMargin)),
    "token_budget_cap" -> Q(tokenBudgetCap, Some(
      raw"""WITH $toksCte,
           |m AS (SELECT id,
           |  len(toks)::DOUBLE AS n_tok,
           |  len(list_filter(toks, w -> w IN $enList))::DOUBLE / len(toks) AS stop_ratio,
           |  length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / len(toks) AS avg_wlen
           |  FROM t),
           |s AS (SELECT m.id, d.source, m.n_tok::BIGINT AS n_tok,
           |  floor((0.4 * least(1.0, m.n_tok / 50.0)
           |       + 0.3 * least(1.0, stop_ratio * 5.0)
           |       + 0.3 * least(1.0, avg_wlen / 5.0)) * 10000.0 + 0.5) / 10000.0 AS quality
           |  FROM m JOIN documents d ON m.id = d.doc_id),
           |c AS (SELECT id, source, n_tok, quality,
           |  CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY quality DESC, id)
           |       AS BIGINT) AS cum_tok
           |  FROM s)
           |SELECT id, source, n_tok, quality, cum_tok FROM c
           |WHERE cum_tok <= 600 ORDER BY source, cum_tok""".stripMargin)),
    "events_quantiles" -> Q(eventsQuantiles, Some(
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.25), 4) AS q25,
        |       round(quantile_cont(value, 0.50), 4) AS q50,
        |       round(quantile_cont(value, 0.90), 4) AS q90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    "approx_distinct_kmv" -> Q(approxDistinctKmv, Some(
      """WITH h AS (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        |a AS (SELECT event_type, count(*) AS n_exact, list(h ORDER BY h)[64] AS hk
        |      FROM h GROUP BY 1)
        |SELECT event_type, n_exact,
        |       round(CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
        |                  ELSE 63.0 / (CAST(CAST(concat('0x', substr(hk, 1, 13)) AS UBIGINT) AS DOUBLE) / 4503599627370496.0)
        |             END, 4) AS est_kmv
        |FROM a ORDER BY event_type""".stripMargin)),
    "skew_distinct" -> Q(skewDistinct, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    "pivot_revenue" -> Q(pivotRevenue, Some(
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS F,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS O,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    "sql_knn" -> Q(sqlKnn, Some(knnSql(7, 10))),
    "dedup_exact" -> Q(dedupExact, Some(
      raw"""WITH n AS (SELECT doc_id AS id,
           |  md5(substr(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 128)) AS fp
           |  FROM documents)
           |SELECT fp, count(*)::BIGINT AS n, min(id) AS min_id, max(id) AS max_id
           |FROM n GROUP BY fp HAVING count(*) > 1""".stripMargin)),
    "dedup_jaccard" -> Q(dedupJaccard, Some(
      raw"""WITH $shinglesCte,
           |gsz AS (SELECT id, count(*)::DOUBLE AS sz FROM grams GROUP BY 1),
           |inter AS (
           |  SELECT l.id AS a, r.id AS b, count(*)::DOUBLE AS inter
           |  FROM grams l JOIN grams r ON l.gram = r.gram AND l.id < r.id
           |  GROUP BY 1, 2)
           |SELECT a, b, round(inter / (sa.sz + sb.sz - inter), 4) AS jac
           |FROM inter JOIN gsz sa ON inter.a = sa.id JOIN gsz sb ON inter.b = sb.id
           |WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
           |ORDER BY jac DESC, a, b""".stripMargin)),
    "dedup_incremental" -> Q(dedupIncremental, Some(dedupIncrementalSql)),
    "dedup_incremental_durable" -> Q(dedupIncrementalDurable, Some(dedupIncrementalSql)),
    "dedup_minhash" -> Q(dedupMinhash, Some(
      raw"""WITH $shinglesCte,
           |sig AS (
           |  SELECT id, s.seed, min(md5(s.seed || '_' || gram)) AS mh
           |  FROM grams, (SELECT unnest(range(0, 16)) AS seed) s GROUP BY 1, 2),
           |bands AS (
           |  SELECT id, seed // 4 AS band, md5(string_agg(mh, '|' ORDER BY seed)) AS bh
           |  FROM sig GROUP BY 1, 2),
           |okb AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING count(*) <= 2000),
           |cand AS (
           |  SELECT DISTINCT l.id AS a, r.id AS b
           |  FROM bands l JOIN okb ON okb.band = l.band AND okb.bh = l.bh
           |  JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id),
           |gsz AS (SELECT id, count(*)::DOUBLE AS sz FROM grams GROUP BY 1),
           |inter AS (
           |  SELECT c.a, c.b, count(*)::DOUBLE AS inter
           |  FROM cand c
           |  JOIN grams ga ON ga.id = c.a
           |  JOIN grams gb ON gb.id = c.b AND gb.gram = ga.gram
           |  GROUP BY 1, 2)
           |SELECT a, b, round(inter / (sa.sz + sb.sz - inter), 4) AS jac
           |FROM inter JOIN gsz sa ON inter.a = sa.id JOIN gsz sb ON inter.b = sb.id
           |WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
           |ORDER BY jac DESC, a, b""".stripMargin)),
    "simhash" -> Q(simhashQ, Some(
      raw"""WITH $simhashCtes
           |SELECT id, sim FROM sh ORDER BY id""".stripMargin)),
    "dedup_simhash" -> Q(dedupSimhash, Some(
      // the maxBucket(2000) skew guard is part of the operator contract
      // and must be RESTATED here — the independent sf1 sweep (round 13)
      // found a 2230-member block bucket that the Spark side dropped and
      // this oracle previously kept (229 phantom pairs); at sf0.01 no
      // bucket ever reaches the cap, which is why the gap hid for 12
      // rounds
      raw"""WITH $simhashCtes,
           |blocks AS (SELECT id, sim, b.blk, substr(sim, 1 + 16 * b.blk, 16) AS bs
           |           FROM sh, (SELECT unnest(range(0, 4)) AS blk) b),
           |ok AS (SELECT blk, bs FROM blocks GROUP BY blk, bs HAVING count(*) <= 2000),
           |cand AS (SELECT DISTINCT l.id AS a, l.sim AS sa, r.id AS b, r.sim AS sb
           |         FROM blocks l JOIN ok ON ok.blk = l.blk AND ok.bs = l.bs
           |         JOIN blocks r ON l.blk = r.blk AND l.bs = r.bs AND l.id < r.id)
           |SELECT a, b, hamming FROM (
           |  SELECT a, b, list_sum(list_transform(range(1, 65),
           |    i -> CASE WHEN substr(sa, i, 1) = substr(sb, i, 1) THEN 0 ELSE 1 END))::BIGINT AS hamming
           |  FROM cand)
           |WHERE hamming <= 3 ORDER BY hamming, a, b""".stripMargin)),
    "dedup_embedding" -> Q(dedupEmbedding, Some(
      raw"""WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS un
           |           FROM embeddings),
           |p AS (SELECT l.vec_id AS a, r.vec_id AS b,
           |        list_sum(list_transform(range(1, 65), i -> l.un[i] * r.un[i])) AS cos
           |      FROM v l JOIN v r ON l.vec_id < r.vec_id)
           |SELECT a, b, round(cos, 4) AS cos FROM p WHERE cos >= 0.45
           |ORDER BY cos DESC, a, b""".stripMargin)),
    "dedup_semantic" -> Q(dedupSemantic, Some(
      // SemDeDup assignment restated exactly: argmin of squared-L2 to the
      // 8 anchor rows over unit vectors (same per-dim (x-a)² left-to-right
      // sum as the NearestCentroid kernel, ties to the lowest anchor id),
      // then within-cluster cosine pairs, larger id dropped
      raw"""WITH v AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS vn
           |           FROM embeddings),
           |a AS (SELECT id AS aid, vn AS an FROM v WHERE id < 8),
           |s AS (SELECT v.id, a.aid,
           |        list_sum(list_transform(range(1, 65), i -> (v.vn[i] - a.an[i]) * (v.vn[i] - a.an[i]))) AS d2
           |      FROM v, a),
           |c AS (SELECT id, aid AS cluster FROM (
           |        SELECT id, aid, row_number() OVER (PARTITION BY id ORDER BY d2 ASC, aid ASC) AS rn
           |        FROM s) t WHERE rn = 1),
           |ok AS (SELECT cluster FROM c GROUP BY cluster HAVING count(*) <= 100000),
           |p AS (SELECT cb.id AS ib, ca.cluster,
           |        list_sum(list_transform(range(1, 65), i -> va.vn[i] * vb.vn[i])) AS cos
           |      FROM c ca JOIN c cb ON ca.cluster = cb.cluster AND ca.id < cb.id
           |      JOIN ok ON ok.cluster = ca.cluster
           |      JOIN v va ON va.id = ca.id JOIN v vb ON vb.id = cb.id)
           |SELECT ib AS id, cluster, round(max(cos), 4) AS max_cos
           |FROM p WHERE cos >= 0.3
           |GROUP BY ib, cluster ORDER BY id""".stripMargin)),
    "dedup_semantic_incremental" -> Q(dedupSemanticIncremental, Some(
      // the batch-arm oracle: identical union-drop rule restricted to
      // dropped ids in the last-10% batch (dense-id append makes the
      // incremental "corpus always kept" rule coincide with drop-larger-id)
      raw"""WITH v AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS vn
           |           FROM embeddings),
           |a AS (SELECT id AS aid, vn AS an FROM v WHERE id < 8),
           |s AS (SELECT v.id, a.aid,
           |        list_sum(list_transform(range(1, 65), i -> (v.vn[i] - a.an[i]) * (v.vn[i] - a.an[i]))) AS d2
           |      FROM v, a),
           |c AS (SELECT id, aid AS cluster FROM (
           |        SELECT id, aid, row_number() OVER (PARTITION BY id ORDER BY d2 ASC, aid ASC) AS rn
           |        FROM s) t WHERE rn = 1),
           |ok AS (SELECT cluster FROM c GROUP BY cluster HAVING count(*) <= 100000),
           |p AS (SELECT cb.id AS ib, ca.cluster,
           |        list_sum(list_transform(range(1, 65), i -> va.vn[i] * vb.vn[i])) AS cos
           |      FROM c ca JOIN c cb ON ca.cluster = cb.cluster AND ca.id < cb.id
           |      JOIN ok ON ok.cluster = ca.cluster
           |      JOIN v va ON va.id = ca.id JOIN v vb ON vb.id = cb.id)
           |SELECT ib AS id, cluster, round(max(cos), 4) AS max_cos
           |FROM p WHERE cos >= 0.3
           |  AND ib >= (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM embeddings)
           |GROUP BY ib, cluster ORDER BY id""".stripMargin)),
    "dedup_semantic_trained" -> Q(dedupSemanticTrained, Some(
      // the trained arm's restatable Lloyd replayed exactly (r13 VERDICT
      // #9; round 15, r14 VERDICT #10 — the sample is now the SEEDED
      // HASH draw, content-unbiased): sample = 2048 lowest
      // md5(id || 'graft') rows, init = its first 8 in (hash, id)
      // order, two rounds of (left-to-right argmin, means summed in
      // (hash, id) order via list_sum(list(x ORDER BY h, id)), empty
      // cluster keeps its center), then the standard within-cluster
      // drop — every double op identical to the Spark trajectory, so
      // the gate hash-matches
      raw"""WITH v AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS vn
           |           FROM embeddings),
           |samp AS (SELECT id, vn, md5(concat(id, 'graft')) AS h
           |         FROM v ORDER BY h, id LIMIT 2048),
           |c0 AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS cid, cv
           |       FROM (SELECT id, h, vn AS cv FROM samp ORDER BY h, id LIMIT 8) t),
           |s1 AS (SELECT samp.id, c0.cid,
           |         list_sum(list_transform(range(1, 65), i -> (samp.vn[i] - c0.cv[i]) * (samp.vn[i] - c0.cv[i]))) AS d2
           |       FROM samp, c0),
           |a1 AS (SELECT id, cid FROM (
           |         SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2 ASC, cid ASC) AS rn
           |         FROM s1) t WHERE rn = 1),
           |m1 AS (SELECT a1.cid, d.i,
           |         list_sum(list(samp.vn[d.i] ORDER BY samp.h, samp.id)) / count(*) AS m
           |       FROM a1 JOIN samp ON samp.id = a1.id, (SELECT unnest(range(1, 65)) AS i) d
           |       GROUP BY a1.cid, d.i),
           |m1v AS (SELECT cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY cid),
           |c1 AS (SELECT c0.cid, COALESCE(m1v.cv, c0.cv) AS cv
           |       FROM c0 LEFT JOIN m1v ON m1v.cid = c0.cid),
           |s2 AS (SELECT samp.id, c1.cid,
           |         list_sum(list_transform(range(1, 65), i -> (samp.vn[i] - c1.cv[i]) * (samp.vn[i] - c1.cv[i]))) AS d2
           |       FROM samp, c1),
           |a2 AS (SELECT id, cid FROM (
           |         SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2 ASC, cid ASC) AS rn
           |         FROM s2) t WHERE rn = 1),
           |m2 AS (SELECT a2.cid, d.i,
           |         list_sum(list(samp.vn[d.i] ORDER BY samp.h, samp.id)) / count(*) AS m
           |       FROM a2 JOIN samp ON samp.id = a2.id, (SELECT unnest(range(1, 65)) AS i) d
           |       GROUP BY a2.cid, d.i),
           |m2v AS (SELECT cid, list(m ORDER BY i) AS cv FROM m2 GROUP BY cid),
           |c2 AS (SELECT c1.cid, COALESCE(m2v.cv, c1.cv) AS cv
           |       FROM c1 LEFT JOIN m2v ON m2v.cid = c1.cid),
           |s AS (SELECT v.id, c2.cid,
           |        list_sum(list_transform(range(1, 65), i -> (v.vn[i] - c2.cv[i]) * (v.vn[i] - c2.cv[i]))) AS d2
           |      FROM v, c2),
           |c AS (SELECT id, cid AS cluster FROM (
           |        SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2 ASC, cid ASC) AS rn
           |        FROM s) t WHERE rn = 1),
           |ok AS (SELECT cluster FROM c GROUP BY cluster HAVING count(*) <= 100000),
           |p AS (SELECT cb.id AS ib, ca.cluster,
           |        list_sum(list_transform(range(1, 65), i -> va.vn[i] * vb.vn[i])) AS cos
           |      FROM c ca JOIN c cb ON ca.cluster = cb.cluster AND ca.id < cb.id
           |      JOIN ok ON ok.cluster = ca.cluster
           |      JOIN v va ON va.id = ca.id JOIN v vb ON vb.id = cb.id)
           |SELECT ib AS id, cluster, round(max(cos), 4) AS max_cos
           |FROM p WHERE cos >= 0.3
           |GROUP BY ib, cluster ORDER BY id""".stripMargin)),
    "dedup_embedding_banded" -> Q(dedupEmbeddingBanded, Some(
      raw"""WITH v AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS vn
           |           FROM embeddings),
           |hw AS (
           |  SELECT b, k, i,
           |         list_sum(list_transform(range(1, 9), j ->
           |           (strpos('0123456789abcdef', substr(md5(b || '_' || k || '_' || i), j, 1)) - 1)
           |             * pow(2.0, 4 * (8 - j)))) / 4294967296.0 - 0.5 AS w
           |  FROM (SELECT unnest(range(0, 16)) AS b),
           |       (SELECT unnest(range(0, 8)) AS k),
           |       (SELECT unnest(range(0, 64)) AS i)),
           |hp AS (SELECT b, k, list(w ORDER BY i) AS wv FROM hw GROUP BY b, k),
           |bits AS (
           |  SELECT v.id, hp.b AS band, hp.k,
           |         CASE WHEN list_sum(list_transform(range(1, 65), i -> v.vn[i] * hp.wv[i])) > 0
           |              THEN '1' ELSE '0' END AS bit
           |  FROM v, hp),
           |sigs AS (SELECT id, band, string_agg(bit, '' ORDER BY k) AS sig FROM bits GROUP BY 1, 2),
           |ok AS (SELECT band, sig FROM sigs GROUP BY band, sig HAVING count(*) <= 10000),
           |bk AS (SELECT s.id, s.band, s.sig FROM sigs s JOIN ok USING (band, sig)),
           |cand AS (SELECT DISTINCT l.id AS a, r.id AS b
           |         FROM bk l JOIN bk r ON l.band = r.band AND l.sig = r.sig AND l.id < r.id),
           |p AS (SELECT c.a, c.b,
           |        list_sum(list_transform(range(1, 65), i -> va.vn[i] * vb.vn[i])) AS cos
           |      FROM cand c JOIN v va ON va.id = c.a JOIN v vb ON vb.id = c.b)
           |SELECT a, b, round(cos, 4) AS cos FROM p WHERE cos >= 0.45
           |ORDER BY cos DESC, a, b""".stripMargin)),
    "dedup_embedding_incremental" -> Q(dedupEmbeddingIncremental, Some(
      raw"""WITH v AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
           |             x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS vn
           |           FROM embeddings),
           |hw AS (
           |  SELECT b, k, i,
           |         list_sum(list_transform(range(1, 9), j ->
           |           (strpos('0123456789abcdef', substr(md5(b || '_' || k || '_' || i), j, 1)) - 1)
           |             * pow(2.0, 4 * (8 - j)))) / 4294967296.0 - 0.5 AS w
           |  FROM (SELECT unnest(range(0, 16)) AS b),
           |       (SELECT unnest(range(0, 8)) AS k),
           |       (SELECT unnest(range(0, 64)) AS i)),
           |hp AS (SELECT b, k, list(w ORDER BY i) AS wv FROM hw GROUP BY b, k),
           |bits AS (
           |  SELECT v.id, hp.b AS band, hp.k,
           |         CASE WHEN list_sum(list_transform(range(1, 65), i -> v.vn[i] * hp.wv[i])) > 0
           |              THEN '1' ELSE '0' END AS bit
           |  FROM v, hp),
           |sigs AS (SELECT id, band, string_agg(bit, '' ORDER BY k) AS sig FROM bits GROUP BY 1, 2),
           |ok AS (SELECT band, sig FROM sigs GROUP BY band, sig HAVING count(*) <= 10000),
           |bk AS (SELECT s.id, s.band, s.sig FROM sigs s JOIN ok USING (band, sig)),
           |cand AS (SELECT DISTINCT l.id AS a, r.id AS b
           |         FROM bk l JOIN bk r ON l.band = r.band AND l.sig = r.sig AND l.id < r.id),
           |p AS (SELECT c.a, c.b,
           |        list_sum(list_transform(range(1, 65), i -> va.vn[i] * vb.vn[i])) AS cos
           |      FROM cand c JOIN v va ON va.id = c.a JOIN v vb ON vb.id = c.b)
           |SELECT a, b, round(cos, 4) AS cos FROM p WHERE cos >= 0.35
           |  AND b >= (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM embeddings)
           |ORDER BY cos DESC, a, b""".stripMargin)),
    "sessionize" -> Q(sessionize, Some(
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),
    // streaming twins: the REAL incremental executors, pinned to the same
    // oracles as their batch counterparts (events_window / sessionize /
    // the flat-scan KNN) — see graft.streaming.StreamingGates
    "streaming_window" -> Q(streamingWindow, Some(
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) / count(*) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "streaming_sink_window" -> Q(streamingSinkWindow, Some(
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) / count(*) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    "streaming_sessionize" -> Q(streamingSessionize, Some(
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),
    "streaming_ingest_knn" -> Q(streamingIngestKnn, Some(knnSql(7, 10))),
    "streaming_ingest_graph" -> Q(streamingIngestGraphKnn, Some(knnSql(43, 10))),
    "streaming_ingest_multibatch" -> Q(streamingIngestMultibatch, Some(knnSql(37, 10))),
    "streaming_fp_dedup" -> Q(streamingFingerprintDedup, Some(
      raw"""SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
           |       min(doc_id) AS kept_id
           |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin)),
    "streaming_containment" -> Q(
      (s, d) => graft.streaming.StreamingGates.streamingContainment(s, d),
      Some(raw"""WITH $winnowCtes,
           |drop_ AS (
           |  SELECT fp FROM fps
           |  WHERE id < (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM documents)
           |  GROUP BY fp HAVING count(*) > 20),
           |pr AS (SELECT id, fp FROM fps WHERE fp NOT IN (SELECT fp FROM drop_))
           |SELECT l.id AS a, r.id AS b, count(*) AS shared
           |FROM pr l JOIN pr r ON l.fp = r.fp AND l.id < r.id
           |GROUP BY 1, 2
           |HAVING count(*) >= 5
           |  AND r.id >= (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM documents)
           |ORDER BY shared DESC, a, b""".stripMargin)),
    "streaming_range_join" -> Q(streamingRangeJoin, Some(
      """WITH p AS (SELECT user_id, ts AS pts, event_id AS purchase_id
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts AS cts, value AS click_value
        |           FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, count(*) AS n_clicks,
        |       round(sum(c.click_value), 4) AS click_sum
        |FROM p JOIN c ON p.user_id = c.user_id
        |   AND epoch_us(c.cts) BETWEEN epoch_us(p.pts) - 3600000000 AND epoch_us(p.pts)
        |GROUP BY p.purchase_id ORDER BY p.purchase_id""".stripMargin)),
    "save_load_knn" -> Q(saveLoadKnn, Some(knnSql(7, 10))),
    "incremental_add_knn" -> Q(incrementalAddKnn, Some(knnSql(13, 10))),
    "ann_ivf_lazy" -> Q(annIvfLazy, Some(knnSql(29, 10))),
    "save_load_lsh_knn" -> Q(saveLoadLshKnn, Some(knnSql(33, 10))),
    "save_load_graph_knn" -> Q(saveLoadGraphKnn, Some(knnSql(61, 10))),
    "incremental_add_graph_knn" -> Q(incrementalAddGraphKnn, Some(knnSql(67, 10))),
    "meta_variant" -> Q(metaVariant, Some(
      // the collection under test ingests docs ⋈ embeddings, so the oracle
      // ranks over the same domain (diverges from plain documents at sf0.1)
      """SELECT doc_id AS id FROM documents
        |WHERE lang = 'en' AND source = 'src3'
        |  AND doc_id IN (SELECT vec_id FROM embeddings)
        |ORDER BY id LIMIT 50""".stripMargin)),
    "range_clicks" -> Q(rangeClicks, Some(
      """WITH p AS (SELECT user_id, ts AS pts, event_id AS purchase_id
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts AS cts, value AS click_value
        |           FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, count(*) AS n_clicks,
        |       round(sum(c.click_value), 4) AS click_sum
        |FROM p JOIN c ON p.user_id = c.user_id
        |   AND epoch_us(c.cts) BETWEEN epoch_us(p.pts) - 3600000000 AND epoch_us(p.pts)
        |GROUP BY p.purchase_id ORDER BY p.purchase_id""".stripMargin)),
    "asof_clicks" -> Q(asofClicks, Some(
      """WITH c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, ts, event_id AS purchase_id
        |           FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, c.click_id, round(c.click_value, 4) AS click_value
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin)),
    "rolling_avg" -> Q(rollingAvg, Some(
      """SELECT event_id, user_id,
        |       CAST(round(CAST((sum(CAST(value AS DECIMAL(18,6))) OVER w)
        |             / (count(*) OVER w) AS DECIMAL(28,8)), 4) AS DOUBLE) AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),
    "tpch_q6" -> Q(tpchQ6, Some(
      """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),
    "tpch_q5" -> Q(tpchQ5, Some(
      """SELECT n_name,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                     (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),
    "tpch_q17" -> Q(tpchQ17, Some(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/7.0 AS avg_yearly
        |FROM lineitem li
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = li.l_partkey)""".stripMargin)),
    "tpch_q18" -> Q(tpchQ18, Some(
      """SELECT o_orderkey, o_totalprice, sum(l_quantity) AS total_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY 1 HAVING sum(l_quantity) > 150)
        |GROUP BY 1, 2
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
    "tpch_q4" -> Q(tpchQ4, Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    "tpch_q14" -> Q(tpchQ14, Some(
      """SELECT round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |              (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |  / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |             (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE), 4)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)),
    "tpch_q7" -> Q(tpchQ7, Some(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                     (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    "tpch_q8" -> Q(tpchQ8, Some(
      """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
        |       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
        |           THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                     (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |         / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                    (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE), 4)
        |         AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    "tpch_q10" -> Q(tpchQ10, Some(
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                     (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       round(c_acctbal, 4) AS c_acctbal, n_name
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),
    "tpch_q15" -> Q(tpchQ15, Some(
      """WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |                  (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |             AS DECIMAL(18,6))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin)),
    "tpch_q13" -> Q(tpchQ13, Some(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),
    "tpch_q22" -> Q(tpchQ22, Some(
      """WITH cust AS (
        |  SELECT c_custkey, n_name, c_acctbal,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NATION_13',
        |                   'NATION_17','NATION_21','NATION_23')),
        |thr AS (SELECT sum(cents) AS s, count(*) AS n FROM cust
        |        WHERE c_acctbal > 0.0)
        |SELECT n_name, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM cust, thr
        |WHERE cents * thr.n > thr.s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),
    "anti_inactive_customers" -> Q(antiInactiveCustomers, Some(
      """SELECT c_mktsegment, count(*) AS n_inactive,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    "rollup_revenue" -> Q(rollupRevenue, Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),
    "cube_revenue" -> Q(cubeRevenue, Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),
    "grouping_sets_revenue" -> Q(groupingSetsRevenue, Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),
    "ntile_revenue" -> Q(ntileRevenue, Some(
      """WITH c AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT c_custkey, revenue,
        |        ntile(10) OVER (ORDER BY revenue DESC, c_custkey) AS decile
        |      FROM c)
        |SELECT decile, count(*) AS n_cust,
        |       min(revenue) AS min_rev, max(revenue) AS max_rev
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin)),
    "set_ops" -> Q(setOps, Some(
      """WITH en AS (SELECT doc_id AS id FROM documents WHERE lang = 'en'),
        |     lng AS (SELECT doc_id AS id FROM documents WHERE n_chars >= 300)
        |SELECT 'both' AS tag, id FROM (SELECT id FROM en INTERSECT SELECT id FROM lng)
        |UNION ALL
        |SELECT 'en_only' AS tag, id FROM (SELECT id FROM en EXCEPT SELECT id FROM lng)
        |ORDER BY tag, id""".stripMargin)),
    "window_top_order" -> Q(windowTopOrder, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk = 1 ORDER BY o_custkey LIMIT 100""".stripMargin)),
  )
}
