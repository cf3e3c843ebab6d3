from .ip import (
    flow_addr_to_string,
    go_ip_to_string,
    ipv4_from_flow_addr,
    ipv4_num_to_string,
    ipv4_string_to_num,
    ipv6_num_to_string,
    ipv6_string_to_num,
    reinterpret_u32_as_bytes16,
)
from .timeutil import to_start_of_five_minute, to_start_of_minute, to_start_of_interval

__all__ = [
    "flow_addr_to_string",
    "go_ip_to_string",
    "ipv4_from_flow_addr",
    "ipv4_num_to_string",
    "ipv4_string_to_num",
    "ipv6_num_to_string",
    "ipv6_string_to_num",
    "reinterpret_u32_as_bytes16",
    "to_start_of_minute",
    "to_start_of_five_minute",
    "to_start_of_interval",
]
