#!/bin/bash
cd /root/repo
echo "=== bench nside=128 nfreq=32 ==="
timeout 560 python bench.py --nside 128 --nfreq 32 --repeats 2 --fchunk 16
echo "=== bench nside=256 nfreq=64 ==="
timeout 560 python bench.py --nside 256 --nfreq 64 --repeats 2 --fchunk 16
echo "=== batch2 done ==="
