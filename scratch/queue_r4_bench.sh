#!/bin/bash
# Round-4 bench queue: train (driver protocol) then eval, serialized.
cd /root/repo
echo "=== train ==="
python bench.py
echo "=== eval ==="
python bench.py --mode eval
echo "=== done ==="
