# Deployment image — parity with the reference's FLPR.dockerfile recipe
# (/root/reference/FLPR.dockerfile + README.md:4-108), TPU edition: the CUDA
# torch stack is replaced by the JAX TPU runtime; the native video layer
# builds against system ffmpeg libraries.
FROM ubuntu:22.04

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
        python3.10 python3-pip python3-dev g++ make \
        libavcodec-dev libavformat-dev libavutil-dev libswscale-dev \
        ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY video_desensitization_tpu ./video_desensitization_tpu
COPY run.sh bench.py config.ini.example ./

# TPU runtime: jax[tpu] pulls libtpu; pin per deployment as needed.
RUN pip3 install --no-cache-dir "jax[tpu]" flax optax opencv-python-headless protobuf \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip3 install --no-cache-dir .

# Build the native libav layer for this image's ffmpeg ABI.
RUN make -C video_desensitization_tpu/video/native

# Sanity: the image must report a healthy environment (native layer, codecs).
RUN python3 -m video_desensitization_tpu.cli.doctor

# One-shot record job by default; the resident daemon is
#   docker run ... --entrypoint python3 <img> -m video_desensitization_tpu.cli.serve config.ini
ENTRYPOINT ["./run.sh"]
CMD ["config.ini"]
