# chitu-tpu serving container (packaging parity with the reference's
# Dockerfile, /root/reference/Dockerfile:1-31, rebuilt for TPU hosts:
# no CUDA base image — jax[tpu] brings libtpu; the native host runtime
# (csrc/hostops.cpp) builds at runtime via make, so g++/make are the only
# system build deps).
#
# Build:  docker build -t chitu-tpu .
# Run  :  docker run --privileged --net=host \
#             -v /path/to/ckpts:/ckpts chitu-tpu \
#             models=llama3-8b models.ckpt_dir=/ckpts/llama3-8b \
#             serve.port=21002
# (--privileged + host networking are the standard TPU-VM container
#  requirements for /dev/accel* access and ICI.)

FROM python:3.11-slim-bookworm

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/chitu-tpu

# install deps first so code-only changes don't bust the layer cache
COPY pyproject.toml README.md ./
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        numpy pyyaml aiohttp "pydantic>=2" safetensors transformers

COPY chitu_tpu ./chitu_tpu
COPY csrc ./csrc
COPY scripts ./scripts
COPY benchmarks ./benchmarks
RUN pip install --no-cache-dir --no-deps .

EXPOSE 21002
# args are dotted config overrides (key=value), e.g. models=llama3-8b
ENTRYPOINT ["python", "-m", "chitu_tpu"]
