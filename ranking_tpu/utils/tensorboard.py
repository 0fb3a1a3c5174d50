"""TensorBoard event-file writer without TensorFlow.

The reference's observability is a TensorBoard callback
(tensorflow_ranking/python/keras/pipeline.py:489-495). This writes the same
artifact — `events.out.tfevents.*` files of scalar summaries — using
runtime-built protobuf descriptors (the data/proto.py technique) and the
framework's own TFRecord framing (data/tfrecord.py). Any TensorBoard
install can read the output; the framework itself needs no TF.

Wire contract (tensorflow/core/util/event.proto +
tensorflow/core/framework/summary.proto field numbers):
  Event: wall_time double = 1, step int64 = 2, file_version string = 3,
         summary Summary = 5
  Summary.value repeated Value = 1; Value: tag string = 1,
         simple_value float = 2
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Mapping, Optional

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

from ranking_tpu.data.tfrecord import _masked_crc

_POOL = descriptor_pool.DescriptorPool()
_T = descriptor_pb2.FieldDescriptorProto


def _build():
  f = descriptor_pb2.FileDescriptorProto(
      name='ranking_tpu/tb_event.proto', package='ranking_tpu.tb',
      syntax='proto3')
  value = f.message_type.add(name='SummaryValue')
  value.field.add(name='tag', number=1, type=_T.TYPE_STRING)
  # Explicit presence (synthetic oneof): the real summary.proto declares
  # simple_value inside a oneof, and TensorBoard gates on
  # HasField('simple_value') — a plain proto3 float elides 0.0 from the
  # wire, silently dropping any data point whose value is exactly zero.
  value.oneof_decl.add(name='_simple_value')
  value.field.add(name='simple_value', number=2, type=_T.TYPE_FLOAT,
                  label=_T.LABEL_OPTIONAL, proto3_optional=True,
                  oneof_index=0)
  summary = f.message_type.add(name='Summary')
  summary.field.add(name='value', number=1, type=_T.TYPE_MESSAGE,
                    label=_T.LABEL_REPEATED,
                    type_name='.ranking_tpu.tb.SummaryValue')
  event = f.message_type.add(name='Event')
  event.field.add(name='wall_time', number=1, type=_T.TYPE_DOUBLE)
  event.field.add(name='step', number=2, type=_T.TYPE_INT64)
  event.field.add(name='file_version', number=3, type=_T.TYPE_STRING)
  event.field.add(name='summary', number=5, type=_T.TYPE_MESSAGE,
                  type_name='.ranking_tpu.tb.Summary')
  _POOL.Add(f)


_build()
Event = message_factory.GetMessageClass(
    _POOL.FindMessageTypeByName('ranking_tpu.tb.Event'))


class SummaryWriter:
  """Append-only scalar summary writer (tf.summary.create_file_writer
  analog for scalars)."""

  def __init__(self, log_dir: str):
    os.makedirs(log_dir, exist_ok=True)
    # The pid suffix (as TF's writer uses) keeps two writers created in
    # the same second on one host from interleaving one event file.
    fname = (f'events.out.tfevents.{int(time.time())}.'
             f'{socket.gethostname()}.{os.getpid()}')
    self._path = os.path.join(log_dir, fname)
    self._file = open(self._path, 'ab')
    first = Event()
    first.wall_time = time.time()
    first.file_version = 'brain.Event:2'
    self._write(first.SerializeToString())

  def _write(self, payload: bytes) -> None:
    header = struct.pack('<Q', len(payload))
    self._file.write(header)
    self._file.write(struct.pack('<I', _masked_crc(header)))
    self._file.write(payload)
    self._file.write(struct.pack('<I', _masked_crc(payload)))

  def scalars(self, step: int, values: Mapping[str, float],
              wall_time: Optional[float] = None) -> None:
    ev = Event()
    ev.wall_time = wall_time if wall_time is not None else time.time()
    ev.step = int(step)
    for tag, value in values.items():
      v = ev.summary.value.add()
      v.tag = tag
      v.simple_value = float(value)
    self._write(ev.SerializeToString())

  def flush(self) -> None:
    self._file.flush()

  def close(self) -> None:
    self._file.close()
