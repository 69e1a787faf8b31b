"""Structured Streaming jobs (SURVEY.md §2.11).

The reference's operational mode is incremental batch: a cron job appends a
new CSV partition daily and downstream re-reads the whole folder
(0-ToDo.md:12, logs/scraper.log:827-842). Here that becomes file-source
streaming with ``trigger(availableNow=True)`` — checkpointed, exactly-once,
and identical in results to the batch plan (tests assert the equivalence).
"""
