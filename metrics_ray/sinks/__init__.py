"""Output sinks: resumable, partition-committed training-data layouts."""
