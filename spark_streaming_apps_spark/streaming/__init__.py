from .jobs import (  # noqa: F401
    events_stream, exactly_once_sink_job, highwater_state_stream, late_data_retry_job,
    mapPartitions_sideeffect_job, micro_batch_counts, offset_replay_job,
    per_batch_transform_job, poll_wait_loop_job, repartition_serialize_job,
    stage_stream_files, stop_on_complete_job, stream_static_join_job,
    streaming_cdc_upsert_job, streaming_ivm_job,
    stream_stream_join_job, stream_stream_left_outer_job,
    stream_stream_full_outer_job,
    stream_stream_left_outer_shared, stream_stream_full_outer_shared,
    transform_with_state_job,
    streaming_dedup_job, streaming_dedup_watermarked_job,
    streaming_session_window_job,
    watermark_late_drop_job,
)
