from eigenkernel_tpu.obs.events import EventLog, GLOBAL_LOG, add_event

__all__ = ["EventLog", "GLOBAL_LOG", "add_event"]
