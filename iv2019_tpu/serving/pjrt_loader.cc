// TPU-native C++ serving loader: StableHLO -> PJRT plugin -> device.
//
// The reference deploys a frozen TF GraphDef through the TF C++ runtime
// (reference tools/pb2pbtxt.py + define_savers.py:68-69 frozen-graph saver).
// The TPU-native equivalent deploys the exported StableHLO module
// (iv2019_tpu/tools/export_model.py) through the PJRT C API — the same
// device runtime JAX itself sits on — with no Python or TF anywhere in the
// serving process.
//
//   pjrt_serve PLUGIN.so MODULE.mlir N,H,W,C[:u8] [iters|--stream] [key=val ...]
//
// --stream turns the process into a persistent server: after compile and
// one warmup execute, it reads fixed-size NHWC frames (f32 by default;
// ":u8" suffix on the shape switches the wire+device input to uint8 for
// modules exported with export_model wire_u8 — 4x less transfer) from
// stdin and writes, per frame, an 8-byte little-endian size followed by
// output 0's bytes to stdout — compile cost amortized across requests,
// diagnostics (and the one-line JSON report) on stderr. A reader thread
// overlaps the next frame's stdin read with the current execute, so a
// pipelined client gets execute-bound throughput, not (read+execute+write).
//
// * dlopens any PJRT plugin (libtpu.so, /opt/axon/libaxon_pjrt.so, ...)
// * creates a client with plugin-specific key=value create-options
//   (typed: int if the value parses as an integer, true/false -> bool,
//   else string)
// * compiles the StableHLO text ("mlir" program format) with a
//   hand-encoded CompileOptionsProto (num_replicas=1, num_partitions=1 —
//   protobuf wire format is stable, so no proto library is needed)
// * feeds a synthetic f32 NHWC image batch, executes `iters` times,
//   reports per-iteration wall latency percentiles, and checksums the
//   first output buffer.
//
// Built on demand by iv2019_tpu/serving/__init__.py (mirrors
// iv2019_tpu/native's build-on-first-use pattern).

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_serve: %s\n", msg.c_str());
  std::exit(1);
}

const PJRT_Api* g_api = nullptr;

std::string ErrorMessage(PJRT_Error* err) {
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  return std::string(margs.message, margs.message_size);
}

void FreeError(PJRT_Error* err) {
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
}

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  std::string msg = ErrorMessage(err);
  FreeError(err);
  Die(std::string(what) + ": " + msg);
}

void AwaitEvent(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  Check(g_api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  Check(g_api->PJRT_Event_Destroy(&dargs), "event destroy");
}

// --- minimal protobuf wire-format writer (varint + length-delimited) -----
void PutVarint(std::string* out, uint64_t v) {
  while (v >= 0x80) {
    out->push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out->push_back(static_cast<char>(v));
}
void PutTag(std::string* out, int field, int wire) {
  PutVarint(out, static_cast<uint64_t>(field) << 3 | wire);
}
void PutInt(std::string* out, int field, int64_t v) {
  PutTag(out, field, 0);
  PutVarint(out, static_cast<uint64_t>(v));
}
void PutMsg(std::string* out, int field, const std::string& sub) {
  PutTag(out, field, 2);
  PutVarint(out, sub.size());
  out->append(sub);
}

// xla.CompileOptionsProto with executable_build_options{device_ordinal=-1,
// num_replicas=1, num_partitions=1} (field numbers from
// xla/pjrt/proto/compile_options.proto; wire format is stable).
std::string CompileOptionsBytes() {
  std::string ebo;
  PutInt(&ebo, /*device_ordinal*/ 1, -1);
  PutInt(&ebo, /*num_replicas*/ 4, 1);
  PutInt(&ebo, /*num_partitions*/ 5, 1);
  std::string opts;
  PutMsg(&opts, /*executable_build_options*/ 3, ebo);
  return opts;
}

struct Option {
  std::string key;
  PJRT_NamedValue nv;
  std::string sval;  // storage for string values
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s PLUGIN.so MODULE.mlir N,H,W,C [iters] "
                 "[key=val ...]\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* module_path = argv[2];

  std::vector<int64_t> dims;
  bool u8_input = false;
  {
    std::string shape_arg = argv[3];
    size_t colon = shape_arg.find(':');
    if (colon != std::string::npos) {
      std::string dt = shape_arg.substr(colon + 1);
      if (dt == "u8") u8_input = true;
      else if (dt != "f32") Die("bad dtype suffix (want :u8 or :f32): " + dt);
      shape_arg.resize(colon);
    }
    std::stringstream ss(shape_arg);
    std::string tok;
    while (std::getline(ss, tok, ',')) dims.push_back(std::stoll(tok));
  }
  const size_t dsize = u8_input ? 1 : sizeof(float);
  const PJRT_Buffer_Type in_type =
      u8_input ? PJRT_Buffer_Type_U8 : PJRT_Buffer_Type_F32;
  bool stream = argc > 4 && std::strcmp(argv[4], "--stream") == 0;
  int iters = (argc > 4 && !stream) ? std::atoi(argv[4]) : (stream ? 1 : 10);
  if (iters < 1) iters = 1;  // lat_ms percentile report requires >=1 sample

  // ---- client create options (validated before touching the plugin) ----
  std::vector<Option> opts;
  for (int i = 5; i < argc; ++i) {
    const char* eq = std::strchr(argv[i], '=');
    if (!eq) Die(std::string("bad option (want key=val): ") + argv[i]);
    Option o;
    o.key.assign(argv[i], eq - argv[i]);
    o.sval = eq + 1;
    opts.push_back(o);
  }

  // ---- plugin ----
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen failed: ") + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("GetPjrtApi symbol not found");
  g_api = get_api();
  if (!g_api) Die("GetPjrtApi returned null");
  std::fprintf(stderr, "plugin PJRT API v%d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(g_api->PJRT_Plugin_Initialize(&args), "plugin init");
  }

  // ---- client with key=value create options ----
  std::vector<PJRT_NamedValue> nvs(opts.size());
  for (size_t i = 0; i < opts.size(); ++i) {
    Option& o = opts[i];
    PJRT_NamedValue& nv = nvs[i];
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = o.key.c_str();
    nv.name_size = o.key.size();
    nv.value_size = 1;
    char* end = nullptr;
    long long iv = std::strtoll(o.sval.c_str(), &end, 10);
    if (o.sval == "true" || o.sval == "false") {
      nv.type = PJRT_NamedValue_kBool;
      nv.bool_value = o.sval == "true";
    } else if (end && *end == '\0' && !o.sval.empty()) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = iv;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = o.sval.c_str();
      nv.value_size = o.sval.size();
    }
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = nvs.empty() ? nullptr : nvs.data();
    args.num_options = nvs.size();
    Check(g_api->PJRT_Client_Create(&args), "client create");
    client = args.client;
  }

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    Check(g_api->PJRT_Client_AddressableDevices(&args), "devices");
    if (args.num_addressable_devices == 0) Die("no addressable devices");
    device = args.addressable_devices[0];
    std::fprintf(stderr, "addressable devices: %zu\n",
                 args.num_addressable_devices);
  }

  // ---- compile StableHLO ----
  std::string module_text;
  {
    std::ifstream f(module_path, std::ios::binary);
    if (!f) Die(std::string("cannot read ") + module_path);
    std::stringstream ss;
    ss << f.rdbuf();
    module_text = ss.str();
  }
  std::string copts = CompileOptionsBytes();

  // Executable cache: deserialize a previously-compiled executable if a
  // sidecar file exists (restart in seconds instead of minutes — the
  // flagship module takes 1.5-6 min to compile through the tunnel).
  // The cache is CONTENT-keyed, not path-keyed: a 16-byte header (magic +
  // FNV-1a of module text + compile options) rejects a sidecar left over
  // from a different model exported to the same path — deserialization
  // would succeed on such bytes and silently serve the old model.
  // Serializations are platform/version-specific, so every failure mode
  // (unsupported plugin, stale bytes) soft-falls back to a fresh compile.
  const std::string cache_path = std::string(module_path) + ".pjrt_exec";
  static const char kCacheMagic[8] = {'I', 'V', 'E', 'X', 'E', 'C', '1', 0};
  uint64_t cache_key = 1469598103934665603ULL;  // FNV-1a 64
  for (const std::string* s : {&module_text, &copts}) {
    for (unsigned char c : *s) {
      cache_key ^= c;
      cache_key *= 1099511628211ULL;
    }
  }
  PJRT_LoadedExecutable* exec = nullptr;
  if (g_api->PJRT_Executable_DeserializeAndLoad) {
    std::ifstream cf(cache_path, std::ios::binary);
    if (cf) {
      std::stringstream ss;
      ss << cf.rdbuf();
      std::string bytes = ss.str();
      uint64_t stored_key = 0;
      if (bytes.size() > 16) std::memcpy(&stored_key, bytes.data() + 8, 8);
      if (bytes.size() <= 16 ||
          std::memcmp(bytes.data(), kCacheMagic, 8) != 0 ||
          stored_key != cache_key) {
        std::fprintf(stderr,
                     "executable cache stale (module or compile options "
                     "changed); recompiling\n");
      } else {
        PJRT_Executable_DeserializeAndLoad_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
        args.client = client;
        args.serialized_executable = bytes.data() + 16;
        args.serialized_executable_size = bytes.size() - 16;
        auto t0 = std::chrono::steady_clock::now();
        PJRT_Error* err = g_api->PJRT_Executable_DeserializeAndLoad(&args);
        if (err) {
          std::fprintf(stderr,
                       "executable cache load failed (%s); recompiling\n",
                       ErrorMessage(err).c_str());
          FreeError(err);
        } else {
          exec = args.loaded_executable;
          std::fprintf(
              stderr, "loaded cached executable (%zu bytes) in %.1f s\n",
              bytes.size(),
              std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count());
        }
      }
    }
  }
  if (!exec) {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = module_text.data();
    program.code_size = module_text.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &program;
    args.compile_options = copts.data();
    args.compile_options_size = copts.size();
    auto t0 = std::chrono::steady_clock::now();
    Check(g_api->PJRT_Client_Compile(&args), "compile");
    auto t1 = std::chrono::steady_clock::now();
    exec = args.executable;
    std::fprintf(
        stderr, "compiled in %.1f s\n",
        std::chrono::duration<double>(t1 - t0).count());

    // best-effort: write the serialized executable for fast restarts
    if (g_api->PJRT_Executable_Serialize) {
      PJRT_LoadedExecutable_GetExecutable_Args gargs;
      std::memset(&gargs, 0, sizeof(gargs));
      gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
      gargs.loaded_executable = exec;
      PJRT_Error* gerr = g_api->PJRT_LoadedExecutable_GetExecutable(&gargs);
      if (gerr) {
        FreeError(gerr);
      } else {
        PJRT_Executable_Serialize_Args sargs;
        std::memset(&sargs, 0, sizeof(sargs));
        sargs.struct_size = PJRT_Executable_Serialize_Args_STRUCT_SIZE;
        sargs.executable = gargs.executable;
        PJRT_Error* serr = g_api->PJRT_Executable_Serialize(&sargs);
        if (serr) {
          std::fprintf(stderr, "executable serialize unsupported (%s)\n",
                       ErrorMessage(serr).c_str());
          FreeError(serr);
        } else {
          std::ofstream out(cache_path + ".tmp",
                            std::ios::binary | std::ios::trunc);
          out.write(kCacheMagic, 8);
          out.write(reinterpret_cast<const char*>(&cache_key), 8);
          out.write(sargs.serialized_bytes,
                    static_cast<std::streamsize>(sargs.serialized_bytes_size));
          out.close();
          if (out && std::rename((cache_path + ".tmp").c_str(),
                                 cache_path.c_str()) == 0) {
            std::fprintf(stderr, "executable cache written: %s (%zu bytes)\n",
                         cache_path.c_str(), sargs.serialized_bytes_size);
          }
          if (sargs.serialized_executable_deleter) {
            sargs.serialized_executable_deleter(sargs.serialized_executable);
          }
        }
      }
    }
  }

  size_t num_outputs = 0;
  {
    PJRT_LoadedExecutable_GetExecutable_Args gargs;
    std::memset(&gargs, 0, sizeof(gargs));
    gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    gargs.loaded_executable = exec;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&gargs), "get exec");
    PJRT_Executable_NumOutputs_Args nargs;
    std::memset(&nargs, 0, sizeof(nargs));
    nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    nargs.executable = gargs.executable;
    Check(g_api->PJRT_Executable_NumOutputs(&nargs), "num outputs");
    num_outputs = nargs.num_outputs;
  }
  std::fprintf(stderr, "executable outputs: %zu\n", num_outputs);

  // ---- input buffer: synthetic image batch ([-1,1) f32 or raw u8) ----
  int64_t elems = 1;
  for (int64_t d : dims) elems *= d;
  std::vector<uint8_t> host_in(static_cast<size_t>(elems) * dsize);
  if (u8_input) {
    for (size_t i = 0; i < host_in.size(); ++i) {
      host_in[i] = static_cast<uint8_t>((i * 2654435761u) % 256);
    }
  } else {
    float* f = reinterpret_cast<float*>(host_in.data());
    for (int64_t i = 0; i < elems; ++i) {
      f[i] = -1.0f + 2.0f * static_cast<float>((i * 2654435761u) % 1000) / 1000.0f;
    }
  }

  PJRT_Buffer* in_buf = nullptr;
  {
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host_in.data();
    args.type = in_type;
    args.dims = dims.data();
    args.num_dims = dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    Check(g_api->PJRT_Client_BufferFromHostBuffer(&args), "h2d");
    AwaitEvent(args.done_with_host_buffer, "h2d done");
    in_buf = args.buffer;
  }

  // ---- execute ----
  // iteration -1 is an untimed warmup: on tunneled devices the first
  // execute triggers the deferred device compilation (minutes), which
  // would otherwise dominate the p90
  std::vector<double> lat_ms;
  std::vector<uint8_t> host_out;
  for (int it = -1; it < iters; ++it) {
    PJRT_ExecuteOptions eopts;
    std::memset(&eopts, 0, sizeof(eopts));
    eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    // the input is reused across iterations: never donate it
    static const int64_t kNoDonate[] = {0};
    eopts.non_donatable_input_indices = kNoDonate;
    eopts.num_non_donatable_input_indices = 1;

    PJRT_Buffer* const arg_list[] = {in_buf};
    PJRT_Buffer* const* const arg_lists[] = {arg_list};
    std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
    PJRT_Buffer** out_lists[] = {out_list.data()};
    PJRT_Event* done = nullptr;
    PJRT_Event* dev_events[] = {nullptr};

    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &eopts;
    args.argument_lists = arg_lists;
    args.num_devices = 1;
    args.num_args = 1;
    args.output_lists = out_lists;
    args.device_complete_events = dev_events;
    (void)done;

    auto t0 = std::chrono::steady_clock::now();
    Check(g_api->PJRT_LoadedExecutable_Execute(&args), "execute");
    AwaitEvent(dev_events[0], "device completion");
    // host readback of output 0 is the completion barrier: on tunneled
    // devices the completion event can fire before execution finishes
    // (same caveat as jax block_until_ready — see the verify skill notes),
    // so serving latency = execute + readback of the decisions map.
    if (num_outputs > 0) {
      PJRT_Buffer_ToHostBuffer_Args hargs;
      std::memset(&hargs, 0, sizeof(hargs));
      hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      hargs.src = out_list[0];
      Check(g_api->PJRT_Buffer_ToHostBuffer(&hargs), "d2h size query");
      host_out.resize(hargs.dst_size);
      hargs.dst = host_out.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&hargs), "d2h");
      AwaitEvent(hargs.event, "d2h done");
    }
    auto t1 = std::chrono::steady_clock::now();
    if (it >= 0) {
      lat_ms.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
    }

    for (size_t o = 0; o < num_outputs; ++o) {
      PJRT_Buffer_Destroy_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      dargs.buffer = out_list[o];
      Check(g_api->PJRT_Buffer_Destroy(&dargs), "buffer destroy");
    }
  }

  // ---- checksum of the last iteration's output 0 ----
  uint64_t checksum = 0;
  size_t out_bytes = host_out.size();
  for (uint8_t b : host_out) checksum = checksum * 1099511628211ull + b;

  std::sort(lat_ms.begin(), lat_ms.end());
  double p50 = lat_ms[lat_ms.size() / 2];
  double p90 = lat_ms[static_cast<size_t>(lat_ms.size() * 0.9)];
  std::fprintf(
      stream ? stderr : stdout,
      "{\"metric\": \"pjrt_serve_p50_latency_ms\", \"value\": %.2f, "
      "\"unit\": \"ms\", \"detail\": {\"p90_ms\": %.2f, \"iters\": %d, "
      "\"outputs\": %zu, \"output0_bytes\": %zu, \"output0_fnv\": "
      "\"%016llx\"}}\n",
      p50, p90, iters, num_outputs, out_bytes,
      static_cast<unsigned long long>(checksum));
  if (!stream) return 0;

  // ---- persistent streaming server ----
  // frame in: exactly elems x dsize bytes from stdin; response out: u64-LE
  // size + output-0 bytes on stdout. EOF on stdin ends the process cleanly.
  // A reader thread pulls the NEXT frame from stdin while the device runs
  // the current one (double buffer + 1-slot mailbox): a pipelined client
  // sees execute-bound req/s instead of read+execute+write.
  const size_t frame_bytes = static_cast<size_t>(elems) * dsize;
  std::fprintf(stderr, "streaming: frame=%zu bytes (%s), ready\n",
               frame_bytes, u8_input ? "u8" : "f32");
  size_t served = 0;

  std::vector<uint8_t> frames[2] = {
      std::vector<uint8_t>(frame_bytes), std::vector<uint8_t>(frame_bytes)};
  std::mutex mu;
  std::condition_variable cv_full, cv_free;
  int ready_slot = -1;      // slot holding an unconsumed frame
  bool reader_eof = false;  // stdin closed / short frame
  int free_slot = 0;        // next slot the reader may fill

  std::thread reader([&] {
    for (;;) {
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return ready_slot == -1 || reader_eof; });
        if (reader_eof) return;
        slot = free_slot;
      }
      size_t got = std::fread(frames[slot].data(), 1, frame_bytes, stdin);
      std::unique_lock<std::mutex> lk(mu);
      if (got != frame_bytes) {
        if (got != 0) std::fprintf(stderr, "short frame on stdin\n");
        reader_eof = true;
        cv_full.notify_one();
        return;
      }
      ready_slot = slot;
      free_slot = 1 - slot;
      cv_full.notify_one();
    }
  });

  for (;;) {
    int slot;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] { return ready_slot != -1 || reader_eof; });
      if (ready_slot == -1) break;  // EOF and no pending frame
      slot = ready_slot;
    }

    // Per-request RPC budget matters through the tunneled plugin (every
    // PJRT call is a proxy round trip): enqueue h2d + execute + d2h
    // back-to-back WITHOUT intermediate awaits — the only blocking wait
    // is on the final d2h event (PJRT orders the dependencies on-device).
    auto t0 = std::chrono::steady_clock::now();
    PJRT_Buffer* req_buf = nullptr;
    PJRT_Event* h2d_done = nullptr;
    {
      PJRT_Client_BufferFromHostBuffer_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      args.client = client;
      args.data = frames[slot].data();
      args.type = in_type;
      args.dims = dims.data();
      args.num_dims = dims.size();
      args.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
      args.device = device;
      Check(g_api->PJRT_Client_BufferFromHostBuffer(&args), "h2d");
      h2d_done = args.done_with_host_buffer;
      req_buf = args.buffer;
    }

    PJRT_ExecuteOptions eopts;
    std::memset(&eopts, 0, sizeof(eopts));
    eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    static const int64_t kNoDonate[] = {0};
    eopts.non_donatable_input_indices = kNoDonate;
    eopts.num_non_donatable_input_indices = 1;
    PJRT_Buffer* const arg_list[] = {req_buf};
    PJRT_Buffer* const* const arg_lists[] = {arg_list};
    std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
    PJRT_Buffer** out_lists[] = {out_list.data()};

    PJRT_LoadedExecutable_Execute_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    eargs.executable = exec;
    eargs.options = &eopts;
    eargs.argument_lists = arg_lists;
    eargs.num_devices = 1;
    eargs.num_args = 1;
    eargs.output_lists = out_lists;
    eargs.device_complete_events = nullptr;  // d2h below is the sync point

    Check(g_api->PJRT_LoadedExecutable_Execute(&eargs), "execute");
    // the h2d copy out of the frame slot is complete (or completes
    // independently of execute): settle its event and hand the slot back
    // so the reader's next stdin read overlaps this execute + d2h
    AwaitEvent(h2d_done, "h2d done");
    {
      std::unique_lock<std::mutex> lk(mu);
      ready_slot = -1;
      cv_free.notify_one();
    }
    if (num_outputs > 0) {
      PJRT_Buffer_ToHostBuffer_Args hargs;
      std::memset(&hargs, 0, sizeof(hargs));
      hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      hargs.src = out_list[0];
      if (served == 0) {  // output size is fixed: query once, reuse
        Check(g_api->PJRT_Buffer_ToHostBuffer(&hargs), "d2h size query");
        host_out.resize(hargs.dst_size);
      } else {
        hargs.dst_size = host_out.size();
      }
      hargs.dst = host_out.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&hargs), "d2h");
      AwaitEvent(hargs.event, "d2h done");
    }
    auto t1 = std::chrono::steady_clock::now();

    uint64_t size_le = static_cast<uint64_t>(host_out.size());
    if (std::fwrite(&size_le, sizeof(size_le), 1, stdout) != 1 ||
        (host_out.size() &&
         std::fwrite(host_out.data(), 1, host_out.size(), stdout) !=
             host_out.size())) {
      Die("stdout write failed");
    }
    std::fflush(stdout);

    for (size_t o = 0; o < num_outputs; ++o) {
      PJRT_Buffer_Destroy_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      dargs.buffer = out_list[o];
      Check(g_api->PJRT_Buffer_Destroy(&dargs), "buffer destroy");
    }
    {
      PJRT_Buffer_Destroy_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      dargs.buffer = req_buf;
      Check(g_api->PJRT_Buffer_Destroy(&dargs), "request buffer destroy");
    }
    ++served;
    std::fprintf(stderr, "request %zu: %.2f ms\n", served,
                 std::chrono::duration<double, std::milli>(t1 - t0).count());
  }
  {
    std::unique_lock<std::mutex> lk(mu);
    reader_eof = true;
    cv_free.notify_one();
  }
  reader.join();
  std::fprintf(stderr, "streaming done: %zu requests\n", served);
  return 0;
}
