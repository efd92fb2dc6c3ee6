#!/bin/bash
# Start the resident enhance sidecar for emulator integration — the
# counterpart of the reference's in-process ONNX Runtime serving
# (reference README.md:21-27). One process owns the compiled TPU program;
# emulators connect over the unix socket with runtime/sidecar_client.c
# (or test with runtime.sidecar_replay). Concurrent instances share the
# chip (docs/DEPLOYMENT.md "Multi-instance serving").
#
# usage: serve_sidecar.sh [socket] [model] [weights.onnx]
set -e
SOCKET="${1:-/tmp/fsuae_enhance.sock}"
MODEL="${2:-pix_shuffle}"
WEIGHTS="${3:-}"

ARGS=(--socket "$SOCKET" --model "$MODEL" --depth 2 --max_clients 4)
[ -n "$WEIGHTS" ] && ARGS+=(--weights "$WEIGHTS")

exec python -m fs_uae_image_enhancer_project_tpu.runtime.sidecar "${ARGS[@]}"
