#!/bin/bash
# Run a montage_gan_tpu container with the working directory mounted —
# the TPU-native analogue of the reference's docker_run.sh (which wires GPU
# devices; a Cloud TPU VM instead exposes the accelerator via /dev/accel*
# and the host's libtpu).
#
#   ./docker_run.sh train-aio --outdir runs --data data/global --cfg aio
#   IMAGE=my_image:v1 ./docker_run.sh generate --network snap.msgpack ...
set -e

IMAGE="${IMAGE:-montage_gan_tpu:latest}"

if ! docker inspect --format="{{.Id}}" "${IMAGE}" >/dev/null 2>&1; then
    echo "Unknown container image: ${IMAGE} — build it first:"
    echo "  docker build -t montage_gan_tpu:latest ."
    echo "  docker build --build-arg ACCEL=cpu -t montage_gan_tpu:cpu .  # CPU-only host"
    exit 1
fi

TPU_DEVICES=""
for d in /dev/accel*; do
    [ -e "$d" ] && TPU_DEVICES="$TPU_DEVICES --device $d"
done

# --privileged is NOT needed; TPU access needs only the accel devices.
# shellcheck disable=SC2086
docker run --shm-size=2g -it --rm -v "$(pwd)":/workspace \
    --user "$(id -u):$(id -g)" -e HOME=/workspace \
    $TPU_DEVICES --workdir=/workspace "$IMAGE" "$@"
