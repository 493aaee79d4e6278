// Standalone C++ PJRT runner: compile | run | test over a StableHLO module.
//
// Native-deploy parity with the reference's TensorRT CLI
// (tensorrt/segment.cpp:54-189 + trt_dep.cpp:44-230): `compile` builds an
// executable from the exported artifact, `run` executes one inference,
// `test` runs the FPS benchmark loop (test_fps_with_engine role). Instead
// of TensorRT engines this speaks the PJRT C API, so the SAME binary
// drives any PJRT plugin: libtpu.so on a TPU VM, a CPU plugin, etc.
//
// Artifact layout (written by mds_tpu.deploy.export.export_pjrt_artifact):
//   <dir>/module.mlir         textual StableHLO
//   <dir>/compile_options.pb  serialized CompileOptionsProto
//   <dir>/meta.json           input/output shapes
//
// Build (header ships with the tensorflow wheel; no TF libs are linked):
//   g++ -O2 -std=c++17 -I$TF_INCLUDE cpp/pjrt_runner.cpp -ldl -o pjrt_runner
// Usage:
//   pjrt_runner test <artifact_dir> --plugin /path/to/libtpu.so [--iters N]

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    exit(2);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::cerr << what << " failed: "
            << std::string(margs.message, margs.message_size) << "\n";
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  exit(3);
}

struct Meta {
  std::vector<int64_t> in_dims;
};

// minimal meta.json parse: find "input"..."shape": [a, b, c, d]
Meta ParseMeta(const std::string& js) {
  Meta m;
  auto ip = js.find("\"input\"");
  auto sp = js.find("\"shape\"", ip);
  auto lb = js.find('[', sp);
  auto rb = js.find(']', lb);
  std::stringstream ss(js.substr(lb + 1, rb - lb - 1));
  std::string tok;
  while (std::getline(ss, tok, ',')) m.in_dims.push_back(std::stoll(tok));
  return m;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0]
              << " compile|run|test <artifact_dir> --plugin <pjrt_plugin.so>"
                 " [--iters N]\n";
    return 1;
  }
  std::string mode = argv[1];
  std::string dir = argv[2];
  std::string plugin;
  int iters = 100;
  for (int i = 3; i < argc - 1; ++i) {
    if (std::string(argv[i]) == "--plugin") plugin = argv[i + 1];
    if (std::string(argv[i]) == "--iters") iters = std::atoi(argv[i + 1]);
  }
  if (plugin.empty()) {
    std::cerr << "--plugin <pjrt_plugin.so> is required (e.g. libtpu.so on a "
                 "TPU VM)\n";
    return 1;
  }

  void* lib = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    std::cerr << "dlopen(" << plugin << ") failed: " << dlerror() << "\n";
    return 2;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    std::cerr << plugin << " does not export GetPjrtApi\n";
    return 2;
  }
  g_api = get_api();
  std::cout << "PJRT API v" << g_api->pjrt_api_version.major_version << "."
            << g_api->pjrt_api_version.minor_version << " from " << plugin
            << "\n";

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(g_api->PJRT_Plugin_Initialize(&args), "PJRT_Plugin_Initialize");
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    Check(g_api->PJRT_Client_Create(&args), "PJRT_Client_Create");
    client = args.client;
  }

  std::string module = ReadFile(dir + "/module.mlir");
  std::string copts = ReadFile(dir + "/compile_options.pb");
  Meta meta = ParseMeta(ReadFile(dir + "/meta.json"));

  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(module.data());
    program.code_size = module.size();
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
    Check(g_api->PJRT_Client_Compile(&args), "PJRT_Client_Compile");
    exec = args.executable;
    auto dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    std::cout << "compiled in " << dt << " s\n";
  }
  if (mode == "compile") {
    std::cout << "ok\n";
    return 0;
  }

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    Check(g_api->PJRT_Client_AddressableDevices(&args),
          "PJRT_Client_AddressableDevices");
    if (args.num_addressable_devices == 0) {
      std::cerr << "no addressable devices\n";
      return 3;
    }
    device = args.addressable_devices[0];
  }

  // zero-filled uint8 input of the exported shape
  int64_t n_elems = 1;
  for (auto d : meta.in_dims) n_elems *= d;
  std::vector<uint8_t> host(n_elems, 127);
  PJRT_Buffer* in_buf = nullptr;
  {
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host.data();
    args.type = PJRT_Buffer_Type_U8;
    args.dims = meta.in_dims.data();
    args.num_dims = meta.in_dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    Check(g_api->PJRT_Client_BufferFromHostBuffer(&args),
          "PJRT_Client_BufferFromHostBuffer");
    in_buf = args.buffer;
    PJRT_Event_Await_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.event = args.done_with_host_buffer;
    Check(g_api->PJRT_Event_Await(&eargs), "transfer await");
    PJRT_Event_Destroy_Args edargs;
    std::memset(&edargs, 0, sizeof(edargs));
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.event = eargs.event;
    g_api->PJRT_Event_Destroy(&edargs);
  }

  // size the output list from the executable (a fixed array would be stack
  // corruption for modules returning more outputs)
  size_t num_outputs = 0;
  {
    PJRT_LoadedExecutable_GetExecutable_Args gargs;
    std::memset(&gargs, 0, sizeof(gargs));
    gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    gargs.loaded_executable = exec;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&gargs), "GetExecutable");
    PJRT_Executable_NumOutputs_Args nargs;
    std::memset(&nargs, 0, sizeof(nargs));
    nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    nargs.executable = gargs.executable;
    Check(g_api->PJRT_Executable_NumOutputs(&nargs), "NumOutputs");
    num_outputs = nargs.num_outputs;
  }
  std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);

  auto execute_once = [&]() {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* args_list[1] = {in_buf};
    PJRT_Buffer* const* arg_lists[1] = {args_list};
    std::fill(out_list.begin(), out_list.end(), nullptr);
    PJRT_Buffer** out_lists[1] = {out_list.data()};
    PJRT_Event* events[1] = {nullptr};

    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &opts;
    args.argument_lists = arg_lists;
    args.num_devices = 1;
    args.num_args = 1;
    args.output_lists = out_lists;
    args.device_complete_events = events;
    Check(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute");
    PJRT_Event_Await_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.event = events[0];
    Check(g_api->PJRT_Event_Await(&eargs), "execute await");
    PJRT_Event_Destroy_Args edargs;
    std::memset(&edargs, 0, sizeof(edargs));
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.event = events[0];
    g_api->PJRT_Event_Destroy(&edargs);
    for (size_t i = 0; i < num_outputs && out_list[i]; ++i) {
      PJRT_Buffer_Destroy_Args bargs;
      std::memset(&bargs, 0, sizeof(bargs));
      bargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bargs.buffer = out_list[i];
      g_api->PJRT_Buffer_Destroy(&bargs);
    }
  };

  execute_once();  // warmup
  if (mode == "run") {
    std::cout << "ok\n";
    return 0;
  }

  // test: FPS benchmark loop (trt_dep.cpp test_fps_with_engine role)
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) execute_once();
  double dt =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  std::cout << "iters=" << iters << " total=" << dt
            << " s fps=" << (iters / dt) << "\n";
  return 0;
}
