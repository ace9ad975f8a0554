#!/bin/bash
# Round-11 artifact re-stamp: serial, logged, idempotent-ish.
set -x
cd /root/repo
mkdir -p /tmp/r11
date > /tmp/r11/t0
python -m pytest tests/ -q > /tmp/r11/pytest.log 2>&1
echo "pytest rc=$?" >> /tmp/r11/status
python tools/sweep.py > /tmp/r11/sweep.log 2>&1
echo "sweep rc=$?" >> /tmp/r11/status
python bench.py > /tmp/r11/bench.json 2>/tmp/r11/bench.err
echo "bench rc=$?" >> /tmp/r11/status
python tools/scale_audit.py > /tmp/r11/scale_audit.log 2>&1
echo "scale_audit rc=$?" >> /tmp/r11/status
python tools/ingest_bench.py > /tmp/r11/ingest_bench.log 2>&1
echo "ingest_bench rc=$?" >> /tmp/r11/status
SCALE_PROBE_QUERIES=similarity_ivf_topk python tools/scale_probe.py > /tmp/r11/probe_std.log 2>&1
echo "probe_std rc=$?" >> /tmp/r11/status
SCALE_PROBE_OUT=SCALE_TREND_X128 SCALE_PROBE_MULTS=1,8,32,128 SCALE_PROBE_QUERIES=similarity_ivf_topk python tools/scale_probe.py > /tmp/r11/probe_x128.log 2>&1
echo "probe_x128 rc=$?" >> /tmp/r11/status
date > /tmp/r11/t1
echo DONE >> /tmp/r11/status
