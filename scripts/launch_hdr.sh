#!/bin/bash
# Path-parity wrapper: the reference keeps this recipe at scripts/launch_hdr.sh
# (reference scripts/launch_hdr.sh); the implementation lives in tools/.
exec "$(dirname "$0")/../tools/launch_hdr.sh" "$@"
