"""Write-path operators: keyed upsert, partitioned writes, batching."""
