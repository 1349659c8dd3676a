# LynseDB-TPU service image (CPU fallback works anywhere; attach TPU runtime
# for accelerated deployments).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY lynsedb_tpu ./lynsedb_tpu

RUN pip install --no-cache-dir .

ENV LYNSE_ROOT_PATH=/data
VOLUME /data
EXPOSE 7637

ENTRYPOINT ["lynse-tpu", "run", "--host", "0.0.0.0", "--port", "7637"]
