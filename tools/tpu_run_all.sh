#!/bin/bash
# sequential TPU experiments (single client at a time)
cd /root/repo
echo "=== ops probe ==="
timeout 560 python tools/tpu_ops.py scatter gather eigh mmfft2048 2>&1 | grep -v WARNING
echo "=== profile 128 ==="
timeout 560 python tools/tpu_profile.py 128 32 2>&1 | grep -v WARNING
echo "=== profile 256 ==="
timeout 560 python tools/tpu_profile.py 256 64 2>&1 | grep -v WARNING
echo "=== all done ==="
