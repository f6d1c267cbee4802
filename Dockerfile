# Serving image (equivalent of the reference's demo Dockerfile, but for the
# continuous-batching server). For TPU VMs, base on a libtpu-enabled image and
# install jax[tpu] instead.
FROM python:3.12-slim

# libmpg123/libvorbisfile give the native runtime out-of-box mp3/ogg
# reference-upload decode (the reference image needs libsndfile for this)
RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    libmpg123-0 libvorbisfile3 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY sopro_tpu ./sopro_tpu
COPY native ./native
RUN pip install --no-cache-dir -e ".[serve]" && make -C native

ENV SOPRO_HOST=0.0.0.0 SOPRO_PORT=8000 SOPRO_CHUNK_SIZE=16 SOPRO_SLOTS=8
EXPOSE 8000
CMD ["python", "-m", "sopro_tpu.serve.server_stdlib"]
