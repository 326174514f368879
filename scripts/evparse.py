"""Parse a Spark event log (zstd or plain): per-stage wall, task count,
executor run/CPU sums, GC, shuffle fetch-wait/bytes, spill.

Usage: python scripts/evparse.py /tmp/ev.json [top_n]
Decompress rolling logs first:
  python -c "import zstandard;..." or `zstd -d events_*.zstd -o ev.json`
Enable logging without code changes:
  mkdir -p /tmp/sparkconf /tmp/evlog
  printf 'spark.eventLog.enabled true\nspark.eventLog.dir file:///tmp/evlog\n' \
    > /tmp/sparkconf/spark-defaults.conf
  SPARK_CONF_DIR=/tmp/sparkconf <run>
"""
import json
import sys

stages: dict[int, dict] = {}
path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 15
app_start = app_end = None
for line in open(path):
    try:
        e = json.loads(line)
    except Exception:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerApplicationStart":
        app_start = e["Timestamp"]
    elif ev == "SparkListenerApplicationEnd":
        app_end = e["Timestamp"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        s = stages.setdefault(si["Stage ID"], {})
        sub, comp = si.get("Submission Time"), si.get("Completion Time")
        s.update(name=si["Stage Name"].split("\n")[0][:60],
                 tasks=si["Number of Tasks"],
                 wall=round((comp - sub) / 1000, 2) if sub and comp else None,
                 sub=sub, comp=comp)
    elif ev == "SparkListenerTaskEnd":
        m = e.get("Task Metrics") or {}
        s = stages.setdefault(e["Stage ID"], {})
        s["run"] = s.get("run", 0) + (m.get("Executor Run Time") or 0)
        s["cpu"] = s.get("cpu", 0) + (m.get("Executor CPU Time") or 0) / 1e6
        s["gc"] = s.get("gc", 0) + (m.get("JVM GC Time") or 0)
        sr = m.get("Shuffle Read Metrics") or {}
        s["fetch"] = s.get("fetch", 0) + (sr.get("Fetch Wait Time") or 0)
        s["rd"] = s.get("rd", 0) + ((sr.get("Remote Bytes Read") or 0) +
                                    (sr.get("Local Bytes Read") or 0)) / 1e6
        s["wr"] = s.get("wr", 0) + ((m.get("Shuffle Write Metrics") or {})
                                    .get("Shuffle Bytes Written") or 0) / 1e6
        s["spill"] = s.get("spill", 0) + (m.get("Disk Bytes Spilled") or 0) / 1e6

done = sorted(((sid, s) for sid, s in stages.items() if s.get("wall")),
              key=lambda kv: -kv[1]["wall"])
if app_start and app_end:
    print(f"app wall {(app_end - app_start) / 1000:.1f}s; "
          f"sum stage wall {sum(s['wall'] for _, s in done):.1f}s; "
          f"sum run {sum(s.get('run', 0) for _, s in done) / 1000:.0f} core-s; "
          f"sum cpu {sum(s.get('cpu', 0) for _, s in done) / 1000:.0f} core-s")
print(f"{'sid':>4} {'wall':>7} {'tasks':>5} {'runsum_s':>8} {'cpusum_s':>8} "
      f"{'gc_s':>5} {'fetch_s':>7} {'rd_MB':>6} {'wr_MB':>6} {'spill':>6}  name")
for sid, s in done[:top]:
    print(f"{sid:>4} {s['wall']:>7} {s.get('tasks', 0):>5} "
          f"{s.get('run', 0) / 1000:>8.1f} {s.get('cpu', 0) / 1000:>8.1f} "
          f"{s.get('gc', 0) / 1000:>5.1f} {s.get('fetch', 0) / 1000:>7.1f} "
          f"{s.get('rd', 0):>6.0f} {s.get('wr', 0):>6.0f} "
          f"{s.get('spill', 0):>6.0f}  {s.get('name', '')}")
evs = sorted((s["sub"], s["comp"]) for _, s in done if s.get("sub"))
gap, last = 0, None
for sub, comp in evs:
    if last is not None and sub > last:
        gap += sub - last
    last = max(last or comp, comp)
print(f"driver-side gap (no stage running): {gap / 1000:.1f}s")
