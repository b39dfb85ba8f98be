# Runnable environment for montage_gan_tpu (the TPU-native analogue of the
# reference's CUDA container, /root/reference/Dockerfile:1-21).  On a Cloud
# TPU VM the host libtpu is picked up by jax[tpu]; on CPU-only hosts build
# with --build-arg ACCEL=cpu (tests and all CLIs run on the virtual mesh).
FROM python:3.11-slim

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1

# native toolchain for the C++ data-loader runtime (native/mgt_loader.cpp,
# JIT-built on first use with md5 caching) + libpng it decodes with
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libpng-dev \
    && rm -rf /var/lib/apt/lists/*

ARG ACCEL=tpu
WORKDIR /opt/montage_gan_tpu
COPY pyproject.toml README.md ./
COPY montage_gan_tpu ./montage_gan_tpu
RUN if [ "$ACCEL" = "tpu" ]; then \
        pip install --no-cache-dir -e ".[tpu,torch]"; \
    else \
        pip install --no-cache-dir -e ".[torch]"; \
    fi

WORKDIR /workspace
ENTRYPOINT ["montage-gan-tpu"]
CMD ["--help"]
