#!/usr/bin/env bash
# Drop the OS page cache on an interval — used when benchmarking the
# file/mmap storage backends cold (reference: script/free_page_cache.sh:8-10,
# which loops `echo 1 > /proc/sys/vm/drop_caches` for RAM-limited storage
# experiments).  Needs root; pass a loop interval in seconds or "once".
set -euo pipefail
interval="${1:-once}"
drop() { sync; echo 1 > /proc/sys/vm/drop_caches; echo "dropped page cache ($(date +%T))"; }
if [[ "$interval" == "once" ]]; then drop; exit 0; fi
while true; do drop; sleep "$interval"; done
