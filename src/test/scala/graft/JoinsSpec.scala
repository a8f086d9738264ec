package graft

import graft.operators.Joins

class JoinsSpec extends GraftSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.map { case (id, u, t, v) => (id, u, ts(t), v) }
      .toDF("event_id", "user_id", "ts", "value")

  test("asof join picks the most recent right row at or before each left ts") {
    val left = ev(
      (10L, 1L, "2024-01-01 00:05:00", 0.0),
      (11L, 1L, "2024-01-01 00:10:00", 0.0),
      (12L, 2L, "2024-01-01 00:01:00", 0.0)) // user 2 has no prior click -> dropped
    val right = ev(
      (1L, 1L, "2024-01-01 00:01:00", 1.1),
      (2L, 1L, "2024-01-01 00:05:00", 2.2), // equal ts -> counts ("<=")
      (3L, 1L, "2024-01-01 00:07:00", 3.3),
      (4L, 2L, "2024-01-01 00:02:00", 4.4))
    val got = Joins.asofJoin(left, right).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    assert(got === Set((10L, 2L, 2.2), (11L, 3L, 3.3)))
  }

  test("asof join ties on (key, ts) break to the max right event_id") {
    val left = ev((10L, 1L, "2024-01-01 00:05:00", 0.0))
    val right = ev(
      (1L, 1L, "2024-01-01 00:03:00", 1.1),
      (5L, 1L, "2024-01-01 00:03:00", 5.5))
    val got = Joins.asofJoin(left, right).collect().head
    assert((got.getLong(3), got.getDouble(4)) === (5L, 5.5))
  }

  test("range join counts right rows in [ts - w, ts), zero when none") {
    val left = ev(
      (10L, 1L, "2024-01-01 01:00:00", 0.0),
      (11L, 1L, "2024-01-01 02:00:00", 0.0),
      (12L, 2L, "2024-01-01 01:00:00", 0.0))
    val right = ev(
      (1L, 1L, "2024-01-01 00:51:00", 0.0), // in [00:50, 01:00)
      (2L, 1L, "2024-01-01 00:59:59", 0.0), // in
      (3L, 1L, "2024-01-01 01:00:00", 0.0), // boundary: excluded (right-open)
      (4L, 1L, "2024-01-01 00:49:59", 0.0), // too old
      (5L, 2L, "2024-01-01 01:10:00", 0.0)) // after left -> excluded
    val got = Joins.rangeJoinCount(left, right, windowSeconds = 600).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(10L -> 2L, 11L -> 0L, 12L -> 0L))
  }
}
