# Container packaging (the reference ships a ubuntu-18.04 Dockerfile,
# reference Dockerfile:1-14). CPU image by default; on a TPU VM install the
# matching jax[tpu] wheel instead of the pinned CPU jax.
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/svision-tpu
COPY pyproject.toml setup.py ./
COPY svision_tpu ./svision_tpu

RUN pip install --no-cache-dir . \
    # prebuild the native BAM decoder into the installed package (it would
    # also auto-build on first use; doing it here fails the image build
    # loudly if the toolchain is broken)
    && make -C "$(python -c 'import svision_tpu.io, os; \
print(os.path.join(os.path.dirname(svision_tpu.io.__file__), "native"))')"

ENTRYPOINT ["svision-tpu"]
CMD ["--help"]
