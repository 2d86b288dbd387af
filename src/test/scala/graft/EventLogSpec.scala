package graft

import graft.jobs.EventLog

class EventLogSpec extends SparkSpec {

  test("listener captures job lifecycle and flushes to a table") {
    val listener = EventLog.attach(spark)
    Tables(spark, sf, "region").count() // trigger at least one job
    Tables(spark, sf, "nation").count()
    // listener callbacks are async — poll until the bus has delivered
    val deadline = System.currentTimeMillis() + 10000
    while (listener.snapshot.count(_.event == "job_end") < 2 &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    val events = listener.snapshot
    assert(events.count(_.event == "job_start") >= 2)
    assert(events.count(_.event == "job_end") >= 2)
    val table = listener.flush(spark, "graft_event_log")
    assert(table.count() >= 4)
    assert(table.columns.toSet ===
      Set("job_id", "event", "ts_ms", "detail"))
  }
}
