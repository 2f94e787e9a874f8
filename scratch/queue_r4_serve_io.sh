#!/bin/bash
cd /root/repo
echo "=== serve ==="
python bench.py --mode serve
echo "=== io ==="
python bench.py --mode io
echo "=== done ==="
